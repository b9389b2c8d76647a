"""Host->device prefetch wrapper: ordering, laziness, error paths."""

import time

from stroke_prediction_tpu.data.prefetch import prefetch_to_device


def test_order_and_transform():
    out = list(prefetch_to_device(range(10), lambda b: b * 2, depth=2))
    assert out == [2 * i for i in range(10)]


def test_overlap():
    """The worker stages ahead: consuming slowly still sees all items,
    and production overlaps consumption."""
    t0 = time.time()

    def slow_iter():
        for i in range(5):
            time.sleep(0.05)
            yield i

    got = []
    for x in prefetch_to_device(slow_iter(), lambda b: b, depth=2):
        time.sleep(0.05)
        got.append(x)
    # serial would be ~0.5s; overlapped ~0.3s
    assert got == list(range(5))
    assert time.time() - t0 < 0.45


def test_exception_propagates():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), lambda b: b)
    assert next(it) == 1
    try:
        next(it)
    except RuntimeError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("worker exception not propagated")


def test_put_fn_exception():
    it = prefetch_to_device(range(3), lambda b: 1 // b)  # b=0 divides
    try:
        list(it)
    except ZeroDivisionError:
        pass
    else:
        raise AssertionError("put_fn exception not propagated")

"""Double-buffered host -> device batch prefetch.

The reference's input pipeline is a synchronous ``DataLoader`` with 0
workers in the training paths (common/data.py:180-192): every step waits
for host-side stacking.  Here a background thread stages the NEXT batch
(host stack + sharded ``device_put``) while the current step runs on the
TPU, so host input work overlaps device compute (SURVEY.md §2.2
"prefetched host pipeline, double-buffered host->HBM").

The thread only touches jax through ``put_fn`` (device_put /
make_array_from_process_local_data are thread-safe); iteration order and
contents are identical to the wrapped loader.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def prefetch_to_device(batches: Iterable, put_fn: Callable,
                       depth: int = 2) -> Iterator:
    """Yield ``put_fn(batch)`` for each batch, staged ``depth`` ahead by
    a daemon thread.  Exceptions in the worker re-raise at the consuming
    site.  Abandoning the iterator (consumer exception / early break)
    sets a closed flag that the worker checks around its bounded ``put``,
    so the thread exits and releases its staged device batches instead of
    blocking forever with them pinned in HBM.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    closed = threading.Event()

    def _put(item) -> bool:
        while not closed.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not _put(put_fn(b)):
                    return
            _put(_END)
        except BaseException as e:          # noqa: BLE001 — re-raised below
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        closed.set()

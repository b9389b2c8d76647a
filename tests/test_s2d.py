"""s2d-domain conv engine: forward/backward parity vs lax reference
(interpret mode on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from stroke_prediction_tpu.ops.pallas.s2d import (
    S2d, ct_stride2_to_s2d, fold_bn, s2d_affine, s2d_batch_stats,
    s2d_cell_pad, s2d_conv, s2d_conv1x1, s2d_conv_stride2, s2d_crop_unpack,
    s2d_pack, s2d_pool2, s2d_stride2, s2d_unpack)


def _ref_conv(x, k, b, act="none", alpha=0.01, pads=(0, 0, 0),
              dtype=jnp.bfloat16):
    pads = [(0, 0)] + [(p, p) for p in pads] + [(0, 0)]
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    y = lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32) + b
    if act == "leaky_relu":
        y = jnp.where(y > 0, y, alpha * y)
    elif act == "elu":
        y = jnp.where(y > 0, y, alpha * (jnp.exp(y) - 1))
    return y


def _rand(rng, *shape):
    return jnp.asarray(rng.rand(*shape) - 0.5, jnp.float32)


class TestLayout:
    def test_pack_unpack_roundtrip(self, rng):
        x = _rand(rng, 2, 7, 9, 11, 3)
        s = s2d_pack(x, dtype=jnp.float32)
        assert s.cells.shape == (2, 4, 5, 8, 16 * 8)
        assert s.logical == (7, 9, 11, 3)
        np.testing.assert_array_equal(np.asarray(s2d_unpack(s)),
                                      np.asarray(x))

    def test_zero_invariant(self, rng):
        s = s2d_pack(_rand(rng, 1, 5, 6, 9, 2), dtype=jnp.float32)
        total = float(jnp.sum(jnp.abs(s.cells)))
        valid = float(jnp.sum(jnp.abs(s2d_unpack(s))))
        assert abs(total - valid) < 1e-5

    def test_crop_unpack(self, rng):
        x = _rand(rng, 2, 10, 12, 14, 4)
        s = s2d_pack(x, dtype=jnp.float32)
        got = s2d_crop_unpack(s, (3, 1, 5), (4, 7, 6))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(x[:, 3:7, 1:8, 5:11, :]))

    def test_cell_pad(self, rng):
        x = _rand(rng, 1, 6, 8, 10, 3)
        s = s2d_cell_pad(s2d_pack(x, dtype=jnp.float32), (0, 2, 2))
        ref = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)))
        assert s.logical == (6, 12, 14, 3)
        np.testing.assert_array_equal(np.asarray(s2d_unpack(s)),
                                      np.asarray(ref))

    def test_pool2(self, rng):
        x = _rand(rng, 2, 7, 9, 11, 5)
        got = s2d_pool2(s2d_pack(x, dtype=jnp.float32))
        ref = lax.reduce_window(x, -jnp.inf, lax.max,
                                (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_stride2(self, rng):
        x = _rand(rng, 1, 7, 8, 9, 3)
        got = s2d_stride2(s2d_pack(x, dtype=jnp.float32))
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(x[:, ::2, ::2, ::2, :]))

    @pytest.mark.parametrize("impl", ["wide", "wide_small"])
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_pack_impls_equal(self, rng, monkeypatch, impl, dtype):
        """The merged-lane gemm pack paths are bit-exact vs the
        transpose path (one-hot selections), values AND gradients."""
        import stroke_prediction_tpu.ops.pallas.s2d as s2d_mod

        for shape in [(2, 7, 9, 11, 3), (1, 8, 12, 16, 16),
                      (2, 9, 13, 17, 2)]:
            x = jnp.asarray(rng.rand(*shape) - 0.5, dtype)
            ref = s2d_pack(x)
            monkeypatch.setenv("STROKE_TPU_PACK_IMPL", impl)
            got = s2d_pack(x)
            monkeypatch.setenv("STROKE_TPU_PACK_IMPL", "transpose")
            assert got.cells.shape == ref.cells.shape
            assert got.logical == ref.logical
            np.testing.assert_array_equal(np.asarray(got.cells),
                                          np.asarray(ref.cells))

        def loss_with(impl_name, v):
            monkeypatch.setenv("STROKE_TPU_PACK_IMPL", impl_name)
            out = float(jax.grad(lambda u: jnp.sum(
                s2d_pack(u).cells.astype(jnp.float32) ** 2))(v).sum())
            return out

        v = jnp.asarray(rng.rand(1, 5, 7, 9, 3) - 0.5, dtype)
        assert loss_with(impl, v) == loss_with("transpose", v)

    @pytest.mark.parametrize("impl", ["transpose", "wide", "wide_small"])
    def test_poolpack_matches_pool_then_pack(self, rng, monkeypatch, impl):
        from stroke_prediction_tpu.ops.pallas.s2d import s2d_poolpack

        x = _rand(rng, 2, 9, 13, 15, 4)
        s = s2d_pack(x, dtype=jnp.float32)
        ref = s2d_pack(s2d_pool2(s))            # transpose-path compose
        monkeypatch.setenv("STROKE_TPU_PACK_IMPL", impl)
        got = s2d_poolpack(s)
        assert got.logical == ref.logical
        np.testing.assert_array_equal(np.asarray(got.cells),
                                      np.asarray(ref.cells))


@pytest.mark.parametrize("shape,act,modes", [
    ((2, 8, 10, 12, 4, 6), "leaky_relu", ("v", "v", "v")),
    ((1, 7, 9, 11, 2, 16), "elu", ("v", "v", "v")),
    ((2, 6, 8, 8, 16, 16), "none", ("v", "v", "v")),
    ((1, 6, 9, 10, 3, 5), "elu", ("s", "v", "v")),
])
def test_s2d_conv_forward(rng, shape, act, modes):
    b, d, h, w, ci, co = shape
    x = _rand(rng, b, d, h, w, ci)
    k = _rand(rng, 3, 3, 3, ci, co) * 0.2
    bias = jnp.asarray(rng.rand(co), jnp.float32)
    pads = (1, 0, 0) if modes[0] == "s" else (0, 0, 0)
    ref = _ref_conv(x, k, bias, act, pads=pads)
    out = s2d_conv(s2d_pack(x), k, bias, act=act, modes=modes)
    assert out.logical == ref.shape[1:]
    np.testing.assert_allclose(np.asarray(s2d_unpack(out)),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_s2d_conv_even_pad(rng):
    """Decoder-style pad-(1,2,2) conv: z mode 's' + HW cell pad."""
    x = _rand(rng, 1, 5, 7, 9, 4)
    k = _rand(rng, 3, 3, 3, 4, 6) * 0.2
    bias = jnp.asarray(rng.rand(6), jnp.float32)
    ref = _ref_conv(x, k, bias, "elu", pads=(1, 2, 2))
    s = s2d_cell_pad(s2d_pack(x), (0, 2, 2))
    out = s2d_conv(s, k, bias, act="elu", modes=("s", "v", "v"))
    assert out.logical == ref.shape[1:]
    np.testing.assert_allclose(np.asarray(s2d_unpack(out)),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("modes", [("v", "v", "v"), ("s", "v", "v")])
def test_s2d_conv_grads(rng, modes):
    b, d, h, w, ci, co = 2, 6, 8, 9, 3, 4
    x = _rand(rng, b, d, h, w, ci)
    k = _rand(rng, 3, 3, 3, ci, co) * 0.3
    bias = jnp.asarray(rng.rand(co), jnp.float32) * 0.1
    pads = (1, 0, 0) if modes[0] == "s" else (0, 0, 0)
    tgt = _rand(rng, 1)  # arbitrary scalarizer weights below

    def loss_s2d(x, k, bias):
        out = s2d_conv(s2d_pack(x), k, bias, act="leaky_relu", modes=modes)
        y = s2d_unpack(out).astype(jnp.float32)
        return jnp.sum((y + 0.3) ** 2 * (1.0 + tgt[0]))

    def loss_ref(x, k, bias):
        y = _ref_conv(x, k, bias, "leaky_relu", pads=pads,
                      dtype=jnp.float32).astype(jnp.float32)
        return jnp.sum((y + 0.3) ** 2 * (1.0 + tgt[0]))

    g_s2d = jax.grad(loss_s2d, argnums=(0, 1, 2))(x, k, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, bias)
    for got, ref, name in zip(g_s2d, g_ref, ("dx", "dk", "db")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=0.15, rtol=0.1,
            err_msg=name)


def test_s2d_conv_batch_blocked_matches_per_sample(rng, monkeypatch):
    """STROKE_TPU_BB='auto' (bb samples per grid step) computes the
    same values and grads as the per-sample grid (the default).

    _batch_block reads the env var at TRACE time, and the pallas
    wrappers are jax.jit functions whose cache keys do not include it —
    the jit caches must be cleared around the env flip or the second
    run silently reuses the bb=1 executables (a vacuous comparison)."""
    import stroke_prediction_tpu.ops.pallas.s2d as s2d_mod

    b, d, h, w, ci, co = 4, 6, 8, 9, 3, 4
    x = _rand(rng, b, d, h, w, ci)
    k = _rand(rng, 3, 3, 3, ci, co) * 0.3
    bias = jnp.asarray(rng.rand(co), jnp.float32) * 0.1

    def loss(x, k, bias):
        out = s2d_conv(s2d_pack(x), k, bias, act="elu")
        return jnp.sum(s2d_unpack(out).astype(jnp.float32) ** 2)

    def clear():
        s2d_mod._s2d_conv_p.clear_cache()
        s2d_mod._s2d_conv_bwd_p.clear_cache()

    clear()
    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, k, bias)
    monkeypatch.setenv("STROKE_TPU_BB", "auto")
    clear()
    # prove the blocked path is actually selected at these shapes
    spy = []
    orig = s2d_mod._batch_block
    monkeypatch.setattr(s2d_mod, "_batch_block",
                        lambda *a, **kw: spy.append(orig(*a, **kw))
                        or spy[-1])
    v_bb, g_bb = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, k, bias)
    monkeypatch.setattr(s2d_mod, "_batch_block", orig)
    assert spy and max(spy) > 1, spy
    clear()
    # NOT bit-identical: the bb-unrolled kernel bodies compile to a
    # differently-fused graph, so f32 sums reassociate (last-digit
    # differences); tight allclose is the right contract
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_bb),
                               rtol=1e-6)
    for a, bb_g, name in zip(g_ref, g_bb, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_g),
                                   rtol=2e-5, atol=2e-5, err_msg=name)

    # a forced non-divisor block rounds DOWN to a divisor (a truncated
    # grid would silently skip the trailing samples)
    monkeypatch.setenv("STROKE_TPU_BB", "3")
    assert s2d_mod._batch_block(4, 1) == 2
    monkeypatch.setenv("STROKE_TPU_BB", "4")
    assert s2d_mod._batch_block(6, 1) == 3


def test_s2d_chain_matches_lax(rng):
    """Two chained convs + pool, forward and grads — the U-Net block
    pattern, everything staying in the s2d domain."""
    x = _rand(rng, 2, 10, 12, 14, 2)
    k1 = _rand(rng, 3, 3, 3, 2, 6) * 0.3
    k2 = _rand(rng, 3, 3, 3, 6, 6) * 0.3
    b1 = jnp.zeros((6,))
    b2 = jnp.zeros((6,))

    def f_s2d(x, k1, k2):
        s = s2d_pack(x)
        s = s2d_conv(s, k1, b1, act="leaky_relu")
        s = s2d_conv(s, k2, b2, act="leaky_relu")
        return jnp.sum(s2d_pool2(s).astype(jnp.float32) ** 2)

    def f_ref(x, k1, k2):
        y = _ref_conv(x, k1, b1, "leaky_relu", dtype=jnp.float32)
        y = _ref_conv(y, k2, b2, "leaky_relu", dtype=jnp.float32)
        p = lax.reduce_window(y, -jnp.inf, lax.max,
                              (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")
        return jnp.sum(p.astype(jnp.float32) ** 2)

    v1, g1 = jax.value_and_grad(f_s2d, argnums=(1, 2))(x, k1, k2)
    v2, g2 = jax.value_and_grad(f_ref, argnums=(1, 2))(x, k1, k2)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.3, rtol=0.1)


@pytest.mark.parametrize("pad", [0, 1])
def test_s2d_conv_stride2(rng, pad):
    """Strided encoder conv: s2d in, logical half-res out (torch
    Conv3d(3, stride=2, padding=pad) semantics)."""
    x = _rand(rng, 2, 8, 10, 12, 3)
    k = _rand(rng, 3, 3, 3, 3, 5) * 0.3
    bias = jnp.asarray(rng.rand(5), jnp.float32)
    xp = jnp.pad(x, ((0, 0),) + ((pad, pad),) * 3 + ((0, 0),)) if pad else x
    ref = lax.conv_general_dilated(
        xp, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    got = s2d_conv_stride2(s2d_pack(x, jnp.float32), k, bias, pad=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k", [2, 3])
def test_ct_stride2_to_s2d(rng, k):
    """Transposed stride-2 conv emitting s2d cells directly, vs
    lax.conv_transpose (flax nn.ConvTranspose semantics)."""
    x = _rand(rng, 2, 4, 5, 6, 3)
    kern = _rand(rng, k, k, k, 3, 4) * 0.3
    bias = jnp.asarray(rng.rand(4), jnp.float32)
    ref = lax.conv_transpose(
        x, kern, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    got = ct_stride2_to_s2d(x, kern, bias)
    assert got.logical == ref.shape[1:]
    np.testing.assert_allclose(np.asarray(s2d_unpack(got)),
                               np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_s2d_conv1x1_and_affine(rng):
    """In-domain 1^3 conv and masked channel affine preserve the zero
    invariant and match the logical ops."""
    x = _rand(rng, 1, 5, 7, 9, 4)
    s = s2d_pack(x, jnp.float32)
    k = _rand(rng, 1, 1, 1, 4, 6) * 0.5
    bias = jnp.asarray(rng.rand(6), jnp.float32)
    got = s2d_conv1x1(s, k[0, 0, 0], bias, act="elu", alpha=1.0)
    ref = jnp.einsum("bdhwc,co->bdhwo", x, k[0, 0, 0]) + bias
    ref = jnp.where(ref > 0, ref, jnp.exp(ref) - 1.0)
    np.testing.assert_allclose(np.asarray(s2d_unpack(got)),
                               np.asarray(ref), atol=1e-4, rtol=1e-4)
    # zero invariant after the op
    total = float(jnp.sum(jnp.abs(got.cells)))
    valid = float(jnp.sum(jnp.abs(s2d_unpack(got))))
    assert abs(total - valid) < 1e-3

    scale = jnp.asarray(rng.rand(4) + 0.5, jnp.float32)
    shift = _rand(rng, 4)
    sa = s2d_affine(s, scale, shift)
    np.testing.assert_allclose(np.asarray(s2d_unpack(sa)),
                               np.asarray(x * scale + shift), atol=1e-5)
    total = float(jnp.sum(jnp.abs(sa.cells)))
    valid = float(jnp.sum(jnp.abs(s2d_unpack(sa))))
    assert abs(total - valid) < 1e-3


def test_batch_stats_and_fold(rng):
    """Masked s2d batch stats match logical stats; BN fold is exact:
    conv(x*s + t) == conv_{fold}(x)."""
    x = _rand(rng, 2, 7, 9, 11, 4)
    s = s2d_pack(x, dtype=jnp.float32)
    mean, var = s2d_batch_stats(s)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(jnp.mean(x, (0, 1, 2, 3))),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(jnp.var(x, (0, 1, 2, 3))),
                               atol=1e-5)

    k = _rand(rng, 3, 3, 3, 4, 5) * 0.3
    bias = jnp.asarray(rng.rand(5), jnp.float32)
    scale = jnp.asarray(rng.rand(4) + 0.5, jnp.float32)
    shift = _rand(rng, 4)
    k2, b2 = fold_bn(k, bias, scale, shift)
    ref = _ref_conv(x * scale + shift, k, bias)
    got = _ref_conv(x, k2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_s2d_conv_grads_split_bwd(rng, monkeypatch):
    """The large-layer backward path (separate dx / dW kernels when the
    fused pass would exceed the scoped-VMEM budget) must produce the
    same gradients.  Forced via a zero budget; distinctive shape so the
    jit cache cannot return the fused lowering."""
    from stroke_prediction_tpu.ops.pallas import s2d as s2d_mod
    monkeypatch.setattr(s2d_mod, "_BWD_FUSED_VMEM_BUDGET", 0)
    b, d, h, w, ci, co = 1, 5, 11, 13, 3, 4
    x = _rand(rng, b, d, h, w, ci)
    k = _rand(rng, 3, 3, 3, ci, co) * 0.3
    bias = jnp.asarray(rng.rand(co), jnp.float32) * 0.1

    for modes, pads in ((("v", "v", "v"), (0, 0, 0)),
                        (("s", "v", "v"), (1, 0, 0))):
        def loss_s2d(x, k, bias):
            out = s2d_conv(s2d_pack(x, jnp.float32), k, bias, act="elu",
                           modes=modes)
            return jnp.sum(s2d_unpack(out).astype(jnp.float32) ** 2)

        def loss_ref(x, k, bias):
            y = _ref_conv(x, k, bias, "elu", alpha=0.01, pads=pads,
                          dtype=jnp.float32)
            return jnp.sum(y ** 2)

        g_s2d = jax.grad(loss_s2d, argnums=(0, 1, 2))(x, k, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, bias)
        for got, ref, name in zip(g_s2d, g_ref, ("dx", "dk", "db")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3,
                err_msg=f"{modes} {name}")


def test_upsample2x_to_s2d(rng):
    """Cells-emitting trilinear upsample == logical upsample + pack."""
    from stroke_prediction_tpu.ops import upsample2x_trilinear
    from stroke_prediction_tpu.ops.pallas.s2d import upsample2x_to_s2d
    x = _rand(rng, 2, 5, 9, 10, 3)
    got = upsample2x_to_s2d(x)
    ref = upsample2x_trilinear(x)
    assert got.logical == ref.shape[1:]
    np.testing.assert_allclose(np.asarray(s2d_unpack(got)),
                               np.asarray(ref), atol=1e-5, rtol=1e-5)
    # zero invariant (f32 summation-order noise -> relative tolerance)
    total = float(jnp.sum(jnp.abs(got.cells)))
    valid = float(jnp.sum(jnp.abs(s2d_unpack(got))))
    assert abs(total - valid) < 1e-5 * max(total, 1.0)


def test_s2d_center_crop_cells_and_concat(rng):
    from stroke_prediction_tpu.ops.pallas.s2d import (
        s2d_center_crop_cells, s2d_concat_channels)
    x = _rand(rng, 1, 12, 16, 20, 3)
    s = s2d_pack(x, jnp.float32)
    got = s2d_center_crop_cells(s, (8, 12, 12))
    assert got is not None
    np.testing.assert_allclose(
        np.asarray(s2d_unpack(got)),
        np.asarray(x[:, 2:10, 2:14, 4:16, :]), atol=1e-6)
    total = float(jnp.sum(jnp.abs(got.cells)))
    valid = float(jnp.sum(jnp.abs(s2d_unpack(got))))
    assert abs(total - valid) < 1e-3
    # odd offset -> fallback signal
    assert s2d_center_crop_cells(s, (10, 12, 12)) is None

    y = _rand(rng, 1, 8, 12, 12, 5)
    cat = s2d_concat_channels(s2d_pack(y, jnp.float32), got)
    ref = jnp.concatenate([y, x[:, 2:10, 2:14, 4:16, :]], axis=-1)
    assert cat.logical == ref.shape[1:]
    np.testing.assert_allclose(np.asarray(s2d_unpack(cat)),
                               np.asarray(ref), atol=1e-6)


def test_elu_grad_finite_at_overflow_scale(rng):
    """Pre-activations past exp's overflow point must yield FINITE
    gradients through the autodiffed in-domain ops (the where()-grad
    0 * exp(inf) = NaN trap; poisoned a real training run)."""
    from stroke_prediction_tpu.ops.pallas.s2d import (
        ct_stride2_to_s2d, s2d_conv1x1, s2d_conv_stride2)
    x = _rand(rng, 1, 4, 6, 8, 3) * 100.0          # drive y past ~88
    k3 = jnp.abs(_rand(rng, 3, 3, 3, 3, 4)) * 10.0
    k1 = jnp.abs(_rand(rng, 1, 1, 1, 3, 4)) * 10.0
    bias = jnp.zeros((4,), jnp.float32)

    def loss_stride2(x):
        y = s2d_conv_stride2(s2d_pack(x, jnp.float32), k3, bias, act="elu")
        return jnp.sum(y.astype(jnp.float32))

    def loss_ct(x):
        s = ct_stride2_to_s2d(x, k3, bias, act="elu")
        return jnp.sum(s2d_unpack(s).astype(jnp.float32))

    def loss_1x1(x):
        s = s2d_conv1x1(s2d_pack(x, jnp.float32), k1[0, 0, 0], bias,
                        act="elu")
        return jnp.sum(s2d_unpack(s).astype(jnp.float32))

    for name, fn in (("stride2", loss_stride2), ("ct", loss_ct),
                     ("1x1", loss_1x1)):
        g = jax.grad(fn)(x)
        assert bool(jnp.isfinite(g).all()), name


def test_s2d_conv_input_grad_false_matches_param_grads(rng):
    """input_grad=False (entry convs on data) skips the dx half of the
    backward; kernel/bias gradients must be identical to the full
    backward, and the returned input cotangent is exactly zero."""
    x = jnp.asarray(rng.rand(2, 6, 10, 10, 2), jnp.float32)
    k = jnp.asarray(rng.rand(3, 3, 3, 2, 4) - 0.5, jnp.float32)
    b = jnp.asarray(rng.rand(4), jnp.float32)

    def f(x, k, b, ig):
        s = s2d_conv(s2d_pack(x), k, b, act="leaky_relu", alpha=0.01,
                     input_grad=ig)
        return jnp.sum(s2d_unpack(s).astype(jnp.float32) ** 2)

    gx_t, gk_t, gb_t = jax.grad(lambda *a: f(*a, True),
                                argnums=(0, 1, 2))(x, k, b)
    gx_f, gk_f, gb_f = jax.grad(lambda *a: f(*a, False),
                                argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_t),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(gx_f).max()) == 0.0
    assert float(jnp.abs(gx_t).max()) > 0.0


def test_zpadded_bnconvact_block_grad_parity_all_params(rng):
    """A z-padded BnConvActBlock applies the BN affine to the conv INPUT
    (BN folding is exact only for VALID convs), so the affine's only
    cotangent flows through the conv's dx.  Gradient parity of ALL params
    — BN scale/bias included — between the Pallas-s2d path and the logical
    path, for both input_grad settings, is exactly the configuration where
    a dx-skip silently freezes the entry BatchNorm (round-3 advisor
    finding; reference trains BatchNorm3d(n_input), Cae3D.py:44)."""
    from stroke_prediction_tpu.models.layers import BnConvActBlock
    from stroke_prediction_tpu.ops.pallas.s2d import s2d_pack, s2d_unpack

    x = jnp.asarray(rng.rand(2, 6, 12, 12, 2) * 2 - 1, jnp.float32)

    def build(input_grad):
        return BnConvActBlock(4, padding=(1, 0, 0), act="elu",
                              act_param=1.0, input_grad=input_grad)

    variables = build(True).init(jax.random.PRNGKey(0), x, True)
    # non-trivial BN affine so dscale/dshift are informative
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        / max(v.size, 1), variables)

    def loss_logical(params):
        out, _ = build(True).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_s2d(params, input_grad):
        out, _ = build(input_grad).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            s2d_pack(x), True, mutable=["batch_stats"])
        return jnp.sum(s2d_unpack(out).astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_logical)(variables["params"])
    for ig in (True, False):
        g = jax.grad(lambda p: loss_s2d(p, ig))(variables["params"])
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat = dict((jax.tree_util.keystr(k), v)
                    for k, v in jax.tree_util.tree_leaves_with_path(g))
        for k, ref_leaf in flat_ref:
            name = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat[name]), np.asarray(ref_leaf),
                rtol=2e-4, atol=2e-4,
                err_msg=f"input_grad={ig} param {name}")
            # the BN affine grads must be alive, not silently zero
            assert float(jnp.abs(ref_leaf).max()) > 0.0, name

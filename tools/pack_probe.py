"""Probe: s2d_pack / s2d_pool2 relayout costs and candidate
replacements, at the U-Net step's real geometries (NOTES.md round-2
decomposition: L1 entry pack ~5.9 ms, pool2+pack ~4.8+1.2 ms).

Candidates:
  * pack_mm — the spatial interleave as one-hot parity-split einsums
    (the MXU does the relayout; same trick as augment.crop_batch and
    upsample2x_to_s2d, both measured fast at tiny channel counts)
  * poolpack — pool2+pack fused: lane-group max at half resolution,
    then the half-size interleave

Run on TPU: python tools/pack_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.ops.pallas.s2d import (
    S2d, s2d_pack, s2d_pool2, _cells, _round_up)

DTYPE = jnp.bfloat16


def timed(fn, *args, n=20, label=""):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    tn = time.perf_counter() - t0
    per = (tn - t1) / (n - 1)
    print(f"{label:44s} {per*1e3:8.2f} ms", flush=True)
    return per


def _parity_split_eye(n_out: int, n_in: int, dtype):
    """(2, n_out, n_in) one-hot: [p, i, j] = 1 iff j == 2i + p."""
    i = np.arange(n_out)
    m = np.zeros((2, n_out, n_in), np.float32)
    for p in range(2):
        src = 2 * i + p
        ok = src < n_in
        m[p, i[ok], src[ok]] = 1.0
    return jnp.asarray(m, dtype)


def pack_mm(x, dtype=None):
    """s2d_pack via per-axis one-hot einsums (parity-split selection
    matmuls): the W axis interleave stays a free reshape; H and D become
    MXU matmuls instead of layout transposes."""
    b, d, h, w, c = x.shape
    if dtype is not None:
        x = x.astype(dtype)
    wc = _round_up(_cells(w), 8)
    pads = ((0, 0), (0, d % 2), (0, h % 2), (0, 2 * wc - w), (0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    dc, hc = x.shape[1] // 2, x.shape[2] // 2
    y = x.reshape(b, 2 * dc, 2 * hc, wc, 2 * c)             # (pw, c): free
    # H interleave as matmul: out[b,z,H,w,l] = sum_h M[p,H,h] y[b,z,h,w,l]
    # one-hot selections: exact at ANY matmul precision for bf16 inputs
    # (single nonzero per output row); f32 inputs need HIGHEST to avoid
    # the TPU default's bf16 truncation of the values
    prec = (jax.lax.Precision.HIGHEST if y.dtype == jnp.float32 else None)
    Mh = _parity_split_eye(hc, 2 * hc, y.dtype)
    y = jnp.einsum("pHh,bzhwl->bzHwpl", Mh, y, precision=prec)
    y = y.reshape(b, 2 * dc, hc, wc, 4 * c)
    Md = _parity_split_eye(dc, 2 * dc, y.dtype)
    y = jnp.einsum("pZz,bzhwl->bZhwpl", Md, y, precision=prec)
    y = y.reshape(b, dc, hc, wc, 8 * c)
    lanes = _round_up(8 * c, 128)
    if lanes != 8 * c:
        y = jnp.pad(y, ((0, 0),) * 4 + ((0, lanes - 8 * c),))
    return S2d(y, (d, h, w, c))


def poolpack_mm(s: S2d):
    """Fused pool2 -> next-scale pack: the pooled logical tensor is the
    per-cell lane-group max; pack_mm re-enters the cell layout."""
    return pack_mm(s2d_pool2(s))


def _lane_perm(shape, order, dtype):
    """One-hot (n, n) lane permutation: out = in @ P reorders merged
    lane blocks ``shape`` (row-major) into ``order``."""
    n = int(np.prod(shape))
    idx = np.arange(n).reshape(shape).transpose(order).reshape(n)
    P = np.zeros((n, n), np.float32)
    P[idx, np.arange(n)] = 1.0
    return jnp.asarray(P, dtype)


def pack_wide(x, dtype=None, small_o=False):
    """s2d_pack with the interleave gemms run at MERGED (w*c) lane width.

    pack_mm's einsums kept ``w`` as a batch dim, so their gemms ran at
    N = 2c..4c lanes (the measured '32-lane blocks' plateau).  Here the
    H and D parity splits contract over sublane dims at N = w*c width,
    and the lane reorders are one-hot matmuls too:

      * ``small_o=False``: square (n, n) lane-permutation matmuls
        (K = N = wc*4c..8c — wide, but the constant is n^2);
      * ``small_o=True``: keep ``wc`` as a tensor dim and contract only
        the tiny (parity, 2c) -> 8c one-hot (K = N = 8c).
    """
    b, d, h, w, c = x.shape
    if dtype is not None:
        x = x.astype(dtype)
    wc = _round_up(_cells(w), 8)
    pads = ((0, 0), (0, d % 2), (0, h % 2), (0, 2 * wc - w), (0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    dc, hc = x.shape[1] // 2, x.shape[2] // 2
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    dt = x.dtype

    y = x.reshape(b, 2 * dc, 2 * hc, wc, 2 * c)      # lane blocks (pw, c)
    m = wc * 2 * c
    ym = y.reshape(b, 2 * dc, 2 * hc, m)
    Mh = _parity_split_eye(hc, 2 * hc, dt)
    z = jnp.einsum("pHh,bzhm->bzHpm", Mh, ym, precision=prec)
    Md = _parity_split_eye(dc, 2 * dc, dt)
    u = jnp.einsum("qZz,bzHpm->bZHqpm", Md, z, precision=prec)
    # lanes now (pd, ph, wc, pw, c) split as (q, p, m) dims
    # NB: the shipped copy of these interleaves lives in
    # s2d._pack_interleave_wide (STROKE_TPU_PACK_IMPL); this probe keeps
    # a standalone copy so variants can be hacked without touching the
    # library.
    if small_o:
        ur = u.reshape(b, dc, hc, 4, wc, 2 * c)
        O = _lane_perm((4, 2 * c), (0, 1), dt)       # identity merge
        out = jnp.einsum("bzhpkr,prs->bzhks",
                         ur, O.reshape(4, 2 * c, 8 * c), precision=prec)
    else:
        um = u.reshape(b, dc, hc, 4 * m)
        P = _lane_perm((2, 2, wc, 2 * c), (2, 0, 1, 3), dt)
        out = jnp.einsum("bzhn,nt->bzht", um, P,
                         precision=prec).reshape(b, dc, hc, wc, 8 * c)
    lanes = _round_up(8 * c, 128)
    if lanes != 8 * c:
        out = jnp.pad(out, ((0, 0),) * 4 + ((0, lanes - 8 * c),))
    return S2d(out, (d, h, w, c))


def pool2_wide(s: S2d):
    """pool2 as a lane-halving maximum tree (no (8, c) reshape, no
    layout change): parity-major lanes reduce pairwise to the per-cell
    max in 3 contiguous-slice maxima."""
    d, h, w, c = s.logical
    y = s.cells[..., :8 * c]
    for width in (4 * c, 2 * c, c):
        y = jnp.maximum(y[..., :width], y[..., width:2 * width])
    return y[:, :d // 2, :h // 2, :w // 2, :]


def poolpack_wide(s: S2d, small_o=False):
    return pack_wide(pool2_wide(s), small_o=small_o)


def main():
    rng = np.random.RandomState(0)

    # L1 entry: (6, 68, 168, 168, 2)
    x1 = jnp.asarray(rng.rand(6, 68, 168, 168, 2), DTYPE)
    p_ref = jax.jit(lambda v: s2d_pack(v))
    p_mm = jax.jit(lambda v: pack_mm(v))
    a = p_ref(x1)
    bm = p_mm(x1)
    err = float(jnp.max(jnp.abs(a.cells.astype(jnp.float32)
                                - bm.cells.astype(jnp.float32))))
    print("L1 pack parity err:", err)
    p_w = jax.jit(lambda v: pack_wide(v))
    p_ws = jax.jit(lambda v: pack_wide(v, small_o=True))
    for name, f in (("wide", p_w), ("wide-small", p_ws)):
        e = float(jnp.max(jnp.abs(a.cells.astype(jnp.float32)
                                  - f(x1).cells.astype(jnp.float32))))
        print(f"L1 pack_{name} parity err:", e)
    timed(p_ref, x1, label="L1 pack (current transpose)")
    timed(p_mm, x1, label="L1 pack (einsum)")
    timed(p_w, x1, label="L1 pack (wide perm-mm)")
    timed(p_ws, x1, label="L1 pack (wide small-o)")

    # L2 entry: r1 is (6, 64, 164, 164, 16) logical -> cells
    r1 = jnp.asarray(rng.rand(6, 64, 164, 164, 16), DTYPE)
    s1 = jax.jit(lambda v: s2d_pack(v))(r1)
    pool_ref = jax.jit(lambda s: s2d_pack(s2d_pool2(s)))
    pool_mm = jax.jit(poolpack_mm)
    a = pool_ref(s1)
    bm = pool_mm(s1)
    err = float(jnp.max(jnp.abs(a.cells.astype(jnp.float32)
                                - bm.cells.astype(jnp.float32))))
    print("L2 poolpack parity err:", err)
    pool_w = jax.jit(lambda s: poolpack_wide(s))
    pool_ws = jax.jit(lambda s: poolpack_wide(s, small_o=True))
    for name, f in (("wide", pool_w), ("wide-small", pool_ws)):
        e = float(jnp.max(jnp.abs(a.cells.astype(jnp.float32)
                                  - f(s1).cells.astype(jnp.float32))))
        print(f"L2 poolpack_{name} parity err:", e)
    timed(pool_ref, s1, label="L2 pool2+pack (current)")
    timed(pool_mm, s1, label="L2 pool2+pack (einsum)")
    timed(pool_w, s1, label="L2 pool2+pack (wide perm-mm)")
    timed(pool_ws, s1, label="L2 pool2+pack (wide small-o)")

    # L3 entry: r2 is (6, 28, 78, 78, 32)
    r2 = jnp.asarray(rng.rand(6, 28, 78, 78, 32), DTYPE)
    s2 = jax.jit(lambda v: s2d_pack(v))(r2)
    timed(pool_ref, s2, label="L3 pool2+pack (current)")
    timed(pool_mm, s2, label="L3 pool2+pack (einsum)")

    # alternative L1 entry: first conv in LOGICAL layout (lax 3x2D), pack
    # its 16-channel output (lanes 8*16=128 exactly) instead of the
    # 2-channel input (lanes 16 -> 87% pad waste)
    from stroke_prediction_tpu.models.layers import _conv3d_as_2d
    k1 = jnp.asarray(rng.rand(3, 3, 3, 2, 16) - 0.5, DTYPE)

    def entry_lax_pack(v):
        y = _conv3d_as_2d(v, k1)
        return s2d_pack(y)

    def entry_pack_conv(v):
        from stroke_prediction_tpu.ops.pallas.s2d import s2d_conv
        s = s2d_pack(v)
        return s2d_conv(s, k1.astype(jnp.float32),
                        jnp.zeros((16,), jnp.float32))

    timed(jax.jit(entry_lax_pack), x1, label="L1 conv1(lax)+pack16")
    timed(jax.jit(entry_pack_conv), x1, label="L1 pack+conv1(s2d) [current]")

    # gradients (the step pays pack again in backward)
    g_ref = jax.jit(jax.grad(lambda v: jnp.sum(
        s2d_pack(v).cells.astype(jnp.float32) ** 2)))
    g_mm = jax.jit(jax.grad(lambda v: jnp.sum(
        pack_mm(v).cells.astype(jnp.float32) ** 2)))
    timed(g_ref, x1, label="L1 pack grad (current)")
    timed(g_mm, x1, label="L1 pack grad (einsum)")


if __name__ == "__main__":
    main()

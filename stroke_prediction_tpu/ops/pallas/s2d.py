"""s2d-domain fused 3-D convolution engine (Pallas TPU).

The stroke models' convolutions have 2-64 output channels; the MXU
computes ``2 * 128 * N`` FLOPs per streamed row, so with N = C_out = 16
XLA's conv tops out at ~2-6 TF/s on v5e regardless of K (measured,
tools/perf_probe.py).  This engine packs the 2x2x2 output neighborhood
into the matmul's N dimension (output space-to-depth): N = 8*C_out
reaches the MXU's native 128 lanes at C_out = 16.

Unlike a per-call kernel (pack, conv, unpack each invocation), this
engine keeps activations IN the s2d layout across consecutive layers, so
the space-to-depth/depth-to-space re-layouts amortize over a whole conv
chain (NOTES.md round-1 plan):

  * an :class:`S2d` value is ``(B, Dc, Hc, Wc, 8*Cp)`` cells with
    parity-major channels ``(pd, ph, pw, c)`` plus static logical
    ``(D, H, W, C)`` metadata;
  * **zero invariant**: every slot outside the logical extent (spatial
    garbage from odd dims / grid padding, and padded channels) is
    exactly 0 — enforced by in-kernel masking — so masked BatchNorm
    statistics (sum / true-count) over s2d tensors are exact;
  * the conv's output IS the next conv's input (d2s ∘ s2d = identity on
    the same grid); maxpool(2) is a free channel-group max
    (:func:`s2d_pool2`); a stride-2 conv is the parity-0 channel slice
    of the stride-1 output (:func:`s2d_stride2`);
  * per-axis mode ``'v'`` (valid) or ``'s'`` (pad-1 SAME, a 3-cell
    window) expresses the reference's asymmetric paddings: the CAE
    encoder's z-only pad (reference common/model/Cae3D.py:39-76) is
    ``modes=('s','v','v')``; even pads are exact cell pads
    (:func:`s2d_cell_pad`).

Kernel structure (:func:`_s2d_conv_p`): grid ``(B, Dc_out)``; one input
operand per z-shift (the same array passed with shifted index maps — no
copies); the 4 in-plane taps are built in VMEM from row slices (H) and a
lane-preserving sublane roll (W, ``pltpu.roll``); one accumulated MXU
matmul per tap ``(rows, 8*C_in) @ (8*C_in, 8*C_out)``; bias + activation
(none / leaky_relu / elu) + garbage masking fused.

The custom VJP stays in the s2d domain end-to-end: one fused Pallas pass
(:func:`_s2d_conv_bwd_p`) computes dx — the dual conv with the
flipped/transposed superpatch weights on the cell-padded cotangent (full
correlation) — AND accumulates dW from (tap view x cotangent) products
per grid step in VMEM, folded back onto the 27 taps afterwards; for
layers whose blocks exceed the scoped-VMEM budget the pass splits into
separate dx / dW kernels.  Activation gradients are recovered from the
saved OUTPUT (LeakyReLU sign trick; ELU via ``dy = y + alpha`` for
y < 0) so no pre-activation tensor is stored.

BatchNorm is folded into (kernel, bias) by the caller OUTSIDE the kernel
(models/layers.py) for VALID convs:
``conv(x*s + t) == conv_{k*s}(x) + t @ sum_taps(k)``, exact and
differentiable, so BN -> conv -> act is one device op.  Padded convs
apply the affine masked on the input instead (:func:`s2d_affine`) —
folding would let the shifted bias fire at zero-padded boundary taps.

Beyond the stride-1 kernel, the engine covers the models' whole conv
vocabulary in-domain: stride-2 convs (:func:`s2d_conv_stride2`),
stride-2 transposed convs emitting cells directly
(:func:`ct_stride2_to_s2d`), 1^3 convs as block-diagonal lane matmuls
(:func:`s2d_conv1x1`), maxpool as a channel-group max
(:func:`s2d_pool2`), and fused crop/unpack exits
(:func:`s2d_crop_unpack`).

Reference compute being replaced: common/model/Unet3D.py:14-54 and
common/model/Cae3D.py:39-239 (torch Conv3d/cuDNN).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cells(n: int) -> int:
    return -(-n // 2)


# ---------------------------------------------------------------------------
# The S2d container
# ---------------------------------------------------------------------------

class S2d(NamedTuple):
    """A logical (B, D, H, W, C) tensor in 2x2x2 space-to-depth cell layout.

    cells: (B, Dc, Hc, Wc, L) with the first 8*C lanes holding the
    parity-major channels (pd, ph, pw, c) over the REAL channel count and
    the rest zero lane padding (L = 8*C rounded up to a multiple of 128).
    Dc = ceil(D/2), Hc = ceil(H/2), Wc >= ceil(W/2) (multiple of 8).
    All slots outside the logical extent are zero.
    """

    cells: jnp.ndarray
    logical: Tuple[int, int, int, int]   # (D, H, W, C) — static


jax.tree_util.register_pytree_node(
    S2d,
    lambda s: ((s.cells,), s.logical),
    lambda logical, xs: S2d(xs[0], logical))


def pack_impl() -> str:
    """Active pack implementation: 'transpose' (single-axis interleave
    transposes) or 'wide' / 'wide_small' (interleaves as one-hot gemms
    at merged ``w*c`` lane width — the transpose path's gemm-free layout
    shuffles run at 2c..4c-lane blocks, the measured relayout
    bottleneck; see tools/pack_probe.py).  Override with
    STROKE_TPU_PACK_IMPL; 'auto' selects 'transpose' (TPU A/B of the
    wide variants pending)."""
    v = os.environ.get("STROKE_TPU_PACK_IMPL", "auto")
    if v == "auto":
        return "transpose"
    if v not in ("transpose", "wide", "wide_small"):
        raise ValueError(f"STROKE_TPU_PACK_IMPL={v!r}: expected "
                         "'auto', 'transpose', 'wide' or 'wide_small'")
    return v


@functools.lru_cache(maxsize=None)
def _lane_perm_np(shape: Tuple[int, ...], order: Tuple[int, ...]):
    """One-hot (n, n) lane permutation: ``out = in @ P`` reorders merged
    lane blocks ``shape`` (row-major) into ``order``."""
    n = int(np.prod(shape))
    idx = np.arange(n).reshape(shape).transpose(order).reshape(n)
    P = np.zeros((n, n), np.float32)
    P[idx, np.arange(n)] = 1.0
    return P


@functools.lru_cache(maxsize=None)
def _parity_split_np(n_out: int, n_in: int):
    """(2, n_out, n_in) one-hot: [p, i, j] = 1 iff j == 2i + p."""
    i = np.arange(n_out)
    m = np.zeros((2, n_out, n_in), np.float32)
    for p in range(2):
        src = 2 * i + p
        ok = src < n_in
        m[p, i[ok], src[ok]] = 1.0
    return m


def _pack_interleave_transpose(y, b, dc, hc, wc, c):
    """H and D interleaves as single-axis layout transposes."""
    y = y.reshape(b, 2 * dc, hc, 2, wc, 2 * c)
    y = y.swapaxes(3, 4).reshape(b, 2 * dc, hc, wc, 4 * c)  # (ph, pw, c)
    y = y.reshape(b, dc, 2, hc, wc, 4 * c)
    return jnp.moveaxis(y, 2, 4).reshape(b, dc, hc, wc, 8 * c)


def _pack_interleave_wide(y, b, dc, hc, wc, c, small_o: bool):
    """H and D interleaves as one-hot parity-split gemms over the merged
    ``wc * 2c`` lane dim (N stays MXU-wide instead of 2c..4c), then ONE
    lane reorder: a square ``(4m, 4m)`` one-hot permutation matmul, or —
    'wide_small' — a tiny ``(4, 2c) -> 8c`` one-hot with ``wc`` kept as
    a tensor dim.  One-hot selections are exact for bf16 inputs at any
    matmul precision; f32 uses HIGHEST (the TPU default would round the
    values through bf16)."""
    dt = y.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
    m = wc * 2 * c
    ym = y.reshape(b, 2 * dc, 2 * hc, m)
    Mh = jnp.asarray(_parity_split_np(hc, 2 * hc), dt)
    z = jnp.einsum("pHh,bzhm->bzHpm", Mh, ym, precision=prec)
    Md = jnp.asarray(_parity_split_np(dc, 2 * dc), dt)
    u = jnp.einsum("qZz,bzHpm->bZHqpm", Md, z, precision=prec)
    # lanes now ordered (pd, ph, wc, pw, c) as dims (q, p, m)
    if small_o:
        ur = u.reshape(b, dc, hc, 4, wc, 2 * c)
        O = jnp.asarray(
            _lane_perm_np((4, 2 * c), (0, 1)).reshape(4, 2 * c, 8 * c), dt)
        return jnp.einsum("bzhpkr,prs->bzhks", ur, O, precision=prec)
    um = u.reshape(b, dc, hc, 4 * m)
    P = jnp.asarray(_lane_perm_np((2, 2, wc, 2 * c), (2, 0, 1, 3)), dt)
    out = jnp.einsum("bzhn,nt->bzht", um, P, precision=prec)
    return out.reshape(b, dc, hc, wc, 8 * c)


def s2d_pack(x: jnp.ndarray, dtype=None) -> S2d:
    """(B, D, H, W, C) -> S2d.  Zero-pads odd spatial dims and the W cell
    grid to a multiple of 8; the interleave runs at the REAL channel
    width (lane padding to a 128 multiple happens last, as a cheap
    bandwidth-bound pad instead of an 8x-inflated transpose).

    The W interleave is a free reshape; the H and D interleaves run on
    the :func:`pack_impl` path — single-axis transposes, or one-hot
    gemms over merged lanes.  The engine runs at the input's dtype (the
    caller casts to its compute dtype first; bf16 on TPU by default).
    """
    b, d, h, w, c = x.shape
    wc = _round_up(_cells(w), 8)
    if dtype is not None:
        x = x.astype(dtype)
    pads = ((0, 0), (0, d % 2), (0, h % 2), (0, 2 * wc - w), (0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    dc, hc = x.shape[1] // 2, x.shape[2] // 2
    y = x.reshape(b, 2 * dc, 2 * hc, wc, 2 * c)             # (pw, c): free
    impl = pack_impl()
    if impl == "transpose":
        y = _pack_interleave_transpose(y, b, dc, hc, wc, c)
    else:
        y = _pack_interleave_wide(y, b, dc, hc, wc, c,
                                  small_o=(impl == "wide_small"))
    lanes = _round_up(8 * c, 128)
    if lanes != 8 * c:
        y = jnp.pad(y, ((0, 0),) * 4 + ((0, lanes - 8 * c),))
    return S2d(y, (d, h, w, c))


def s2d_unpack(s: S2d) -> jnp.ndarray:
    """S2d -> logical (B, D, H, W, C)."""
    return s2d_crop_unpack(s, (0, 0, 0), s.logical[:3])


def s2d_crop_unpack(s: S2d, start: Sequence[int],
                    size: Sequence[int]) -> jnp.ndarray:
    """Fused crop + depth-to-space: reads only the covering cell region,
    so cropping exits (e.g. the U-Net's center-crop skip connections)
    never materialize the full-resolution tensor."""
    (zd, yd, xd), (sd, sh, sw) = start, size
    c = s.logical[3]
    z0, y0, x0 = zd // 2, yd // 2, xd // 2
    z1, y1, x1 = _cells(zd + sd), _cells(yd + sh), _cells(xd + sw)
    cells = s.cells[:, z0:z1, y0:y1, x0:x1, :8 * c]
    b, dc, hc, wc, _ = cells.shape
    y = cells.reshape(b, dc, hc, wc, 2, 4 * c)
    y = jnp.moveaxis(y, 4, 2).reshape(b, 2 * dc, hc, wc, 4 * c)
    y = y.reshape(b, 2 * dc, hc, wc, 2, 2 * c)
    y = y.swapaxes(3, 4).reshape(b, 2 * dc, 2 * hc, wc, 2 * c)
    y = y.reshape(b, 2 * dc, 2 * hc, 2 * wc, c)
    oz, oy, ox = zd - 2 * z0, yd - 2 * y0, xd - 2 * x0
    return y[:, oz:oz + sd, oy:oy + sh, ox:ox + sw, :]


def s2d_center_crop(s: S2d, target_dhw: Sequence[int]) -> jnp.ndarray:
    """Center-crop exit (the U-Net's skip connections, reference
    Unet3D.py:6-11): reads only the covering cells — never materializes
    the full-resolution tensor."""
    start = [(cur - t) // 2 for cur, t in zip(s.logical[:3], target_dhw)]
    return s2d_crop_unpack(s, start, target_dhw)


def s2d_cell_pad(s: S2d, pads_dhw: Sequence[int]) -> S2d:
    """Symmetric logical zero-pad: ``pads_dhw`` is the EVEN per-side pad
    per axis (torch ``padding=p`` adds p on both sides), applied as exact
    cell pads.  Odd pads are expressed via conv mode 's' instead."""
    pd, ph, pw = pads_dhw
    assert pd % 2 == 0 and ph % 2 == 0 and pw % 2 == 0, pads_dhw
    d, h, w, c = s.logical
    cz, cy, cx = pd // 2, ph // 2, pw // 2
    wc_new = _round_up(s.cells.shape[3] + 2 * cx, 8)
    cells = jnp.pad(s.cells, (
        (0, 0), (cz, cz), (cy, cy),
        (cx, wc_new - s.cells.shape[3] - cx), (0, 0)))
    return S2d(cells, (d + 2 * pd, h + 2 * ph, w + 2 * pw, c))


def s2d_pool2(s: S2d) -> jnp.ndarray:
    """MaxPool3d(2) (floor) in the s2d domain: a channel-group max — the
    pooled voxel IS the cell's max over its 8 parities.  Returns the
    logical (B, D//2, H//2, W//2, C) tensor (reference: torch
    max_pool3d(x, 2), common/model/Unet3D.py:56-60).

    (A pairwise-maximum tree over lane-group slices was measured 22%
    SLOWER end-to-end than this reshape+max — XLA fuses the reshape-max
    and its gradient well inside the full step; see NOTES.md.)"""
    d, h, w, c = s.logical
    b, dc, hc, wc, _ = s.cells.shape
    # floor semantics: a partially-valid cell is never kept, so the kept
    # cells' 8 parity slots are exactly the 2x2x2 pool window — no masking
    y = s.cells[..., :8 * c].reshape(b, dc, hc, wc, 8, c)
    out = jnp.max(y, axis=4)
    return out[:, :d // 2, :h // 2, :w // 2, :]


def s2d_poolpack(s: S2d) -> S2d:
    """Fused MaxPool3d(2) + next-scale re-pack (the U-Net's between-scale
    transition).  On the 'wide' pack paths the pool is a lane-halving
    maximum tree (3 contiguous-slice maxima, no (8, c) layout split) and
    the re-pack runs as merged-lane one-hot gemms; the 'transpose' path
    composes :func:`s2d_pool2` + :func:`s2d_pack`."""
    if pack_impl() == "transpose":
        return s2d_pack(s2d_pool2(s))
    d, h, w, c = s.logical
    y = s.cells[..., :8 * c]
    for width in (4 * c, 2 * c, c):
        y = jnp.maximum(y[..., :width], y[..., width:2 * width])
    return s2d_pack(y[:, :d // 2, :h // 2, :w // 2, :])


def s2d_stride2(s: S2d) -> jnp.ndarray:
    """Stride-2 subsampling in the s2d domain: the parity-(0,0,0) channel
    group.  Turns a stride-1 s2d conv into a stride-2 conv for free."""
    d, h, w, c = s.logical
    out = s.cells[..., :c]
    return out[:, :_cells(d), :_cells(h), :_cells(w), :]


# ---------------------------------------------------------------------------
# Superpatch weight tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tap_table(modes: Tuple[str, str, str]) -> np.ndarray:
    """T[q, p, a] = flat kernel tap (tz*9+ty*3+tx) fed from in-cell parity
    p of shift-combination q into output parity a, or 27 (zero) when out
    of the 3-tap range.

    q enumerates per-axis cell shifts (z-major): 'v' axes have shifts
    {0, 1} over the natural cell grid; 's' axes have shifts {0, 1, 2}
    over a front-cell-padded grid (logical pad 1 SAME).
    """
    nq = [2 if m == "v" else 3 for m in modes]
    T = np.full((nq[0] * nq[1] * nq[2], 8, 8), 27, np.int64)

    def tap(mode, q, p, a):
        d = 2 * q + p if mode == "v" else 2 * (q - 1) + p
        t = d - a if mode == "v" else d - a + 1
        return t if 0 <= t < 3 else None

    for qi, (qz, qy, qx) in enumerate(
            (z, y, x) for z in range(nq[0]) for y in range(nq[1])
            for x in range(nq[2])):
        for p in range(8):
            pz, py, px = p >> 2 & 1, p >> 1 & 1, p & 1
            for a in range(8):
                az, ay, ax = a >> 2 & 1, a >> 1 & 1, a & 1
                tz = tap(modes[0], qz, pz, az)
                ty = tap(modes[1], qy, py, ay)
                tx = tap(modes[2], qx, px, ax)
                if tz is not None and ty is not None and tx is not None:
                    T[qi, p, a] = (tz * 3 + ty) * 3 + tx
    return T


def superpatch_weights(kernel: jnp.ndarray,
                       modes: Tuple[str, str, str]) -> jnp.ndarray:
    """(3, 3, 3, Ci, Co) -> (n_q, 8*Ci, 8*Co) per-shift weight matrices.
    Row layout (p, ci) matches the s2d channel order; column (a, co)."""
    ci, co = kernel.shape[3], kernel.shape[4]
    k4 = jnp.concatenate(
        [kernel.reshape(27, ci, co), jnp.zeros((1, ci, co), kernel.dtype)])
    T = jnp.asarray(_tap_table(modes))                    # (nq, 8, 8)
    w = k4[T]                                             # (nq, 8, 8, ci, co)
    w = jnp.transpose(w, (0, 1, 3, 2, 4))                 # (nq, 8, ci, 8, co)
    return w.reshape(T.shape[0], 8 * ci, 8 * co)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _roll_w(x, interpret: bool):
    """Shift the W (sublane) axis left by one: out[..., j, :] = x[..., j+1, :]
    (wrap-around lands in the masked garbage region).  jnp.roll lowers to a
    supported Mosaic rotate for bf16; pltpu.roll does not (32-bit only)."""
    del interpret
    return jnp.roll(x, -1, axis=1)


def _act(y, act: str, alpha: float):
    if act == "leaky_relu":
        return jnp.where(y > 0, y, alpha * y)
    if act == "elu":
        # safe-exp: exp() only of the CLAMPED value.  The einsum-based
        # ops (stride-2 / transposed / 1x1) are autodiffed, and the
        # gradient of where() sends a zero cotangent into the untaken
        # branch — 0 * exp(large positive) = 0 * inf = NaN, which once
        # poisoned a whole training run when a pre-activation spiked
        # past exp's overflow point (same guard as jax.nn.elu).
        return jnp.where(y > 0, y,
                         alpha * (jnp.exp(jnp.minimum(y, 0.0)) - 1.0))
    return y


def _conv_kernel(*refs, nz: int, hco: int, wcp: int, c8: int, act: str,
                 alpha: float, out_dtype, out_logical, cout_real: int,
                 bb: int, interpret: bool):
    x_refs = refs[:nz]
    w_ref, b_ref, o_ref = refs[nz], refs[nz + 1], refs[nz + 2]
    do, ho, wo = out_logical
    co8 = w_ref.shape[-1]

    # zero-invariant mask: kill voxels beyond the logical output extent
    # (odd dims / grid padding) and padded output channels
    zc = pl.program_id(1)
    cid = jax.lax.broadcasted_iota(jnp.int32, (hco, wcp, co8), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (hco, wcp, co8), 0)
    wid = jax.lax.broadcasted_iota(jnp.int32, (hco, wcp, co8), 1)
    pz, py, px = (cid // (4 * cout_real)) % 2, \
        (cid // (2 * cout_real)) % 2, (cid // cout_real) % 2
    ok = ((2 * zc + pz < do) & (2 * hid + py < ho) & (2 * wid + px < wo)
          & (cid < 8 * cout_real))

    # one accumulated MXU matmul per tap view; measured equal to
    # concatenated deep-K variants (the MXU streams ~2 rows/cycle at
    # N=128 either way), and the views stay zero-copy.  The batch block
    # (bb samples, statically unrolled) amortizes the per-grid-step
    # overhead that dominates at (1, 1, H, W, C) blocks.
    for s in range(bb):
        acc = None
        for zi in range(nz):
            base = x_refs[zi][s, 0]                   # (hci, wcp, c8)
            rolled = _roll_w(base, interpret)
            for qy in range(2):
                for qx, xv in ((0, base), (1, rolled)):
                    rows = xv[qy:qy + hco].reshape(hco * wcp, c8)
                    part = jnp.dot(rows, w_ref[(zi * 2 + qy) * 2 + qx],
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part

        # b_ref is (1, co8) broadcast, or an (8, co8) block of identical
        # rows for the per-output-plane bias table — row 0 either way
        y = _act(acc + b_ref[0:1], act, alpha)
        y = jnp.where(ok, y.reshape(hco, wcp, co8), 0.0)
        o_ref[s] = y.reshape(1, hco, wcp, co8).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("modes", "act", "alpha", "in_logical",
                              "cout", "out_dtype", "interpret"))
def _s2d_conv_p(cells, wmats, brow, *, modes, act, alpha, in_logical,
                cout, out_dtype, interpret):
    """Pallas conv on s2d cells.  cells: (B, Dci, Hci, Wcp, L_in)
    (z-cell-padded by (1,1) already if modes[0] == 's');
    wmats: (nq, L_in, L_out); brow: (1, L_out); cout: real C_out.
    Returns output cells (B, Dco, Hco, Wcp, L_out)."""
    d, h, w, _ = in_logical
    do = d - 2 if modes[0] == "v" else d
    ho, wo = h - 2, w - 2
    dco, hco = _cells(do), _cells(ho)
    b, dci, hci, wcp, c8 = cells.shape
    nz = 2 if modes[0] == "v" else 3
    nq, _, co8 = wmats.shape
    assert nq == nz * 4, (nq, nz)
    assert brow.shape[0] in (1, 8 * dco), (brow.shape, dco)

    esz = jnp.dtype(cells.dtype).itemsize
    per_b = (nz * hci * wcp * c8 + hco * wcp * co8) * esz \
        + hco * wcp * co8 * 4
    bb = _batch_block(b, per_b)

    # weight layout per (qz, qy, qx) -> kernel loop order (zi, qy, qx)
    kern = functools.partial(
        _conv_kernel, nz=nz, hco=hco, wcp=wcp, c8=c8, act=act, alpha=alpha,
        out_dtype=out_dtype, out_logical=(do, ho, wo),
        cout_real=cout, bb=bb, interpret=interpret)

    def xspec(qz):
        return pl.BlockSpec((bb, 1, hci, wcp, c8),
                            lambda b, d, qz=qz: (b, d + qz, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(b // bb, dco),
        in_specs=[xspec(qz) for qz in range(nz)] + [
            pl.BlockSpec((nq, c8, co8), lambda b, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((8, co8), lambda b, d: (d, 0),
                          memory_space=pltpu.VMEM)
             if brow.shape[0] > 1 else
             pl.BlockSpec((1, co8), lambda b, d: (0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((bb, 1, hco, wcp, co8),
                               lambda b, d: (b, d, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, dco, hco, wcp, co8), out_dtype),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*([cells] * nz), wmats, brow)
    return out


# ---------------------------------------------------------------------------
# Fused backward kernel: dx + dW in one pass
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, nz: int, hco: int, hci: int, wpi: int, wcx: int,
                c8: int, co8: int, dco: int, dx_logical, cin_real: int,
                bb: int, interpret: bool):
    """One grid step (b-block, d): the dx blocks at z-cell d (dual conv
    over the cell-padded cotangent) AND this step's dW contribution
    (g-cell d x the forward tap views), accumulated into a VMEM-resident
    block.  Sharing the pass means the cotangent is DMA'd once and the
    dW matmuls stream at the same rate as the forward's; the bb-sample
    batch block amortizes per-grid-step overhead."""
    g_refs = refs[:nz]
    x_refs = refs[nz:2 * nz]
    wd_ref = refs[2 * nz]
    dx_ref, dw_ref = refs[2 * nz + 1], refs[2 * nz + 2]
    bi, d = pl.program_id(0), pl.program_id(1)

    di, hi, wi = dx_logical                          # forward INPUT extent
    cid = jax.lax.broadcasted_iota(jnp.int32, (hci, wpi, c8), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (hci, wpi, c8), 0)
    wid = jax.lax.broadcasted_iota(jnp.int32, (hci, wpi, c8), 1)
    pz = (cid // (4 * cin_real)) % 2
    py = (cid // (2 * cin_real)) % 2
    px = (cid // cin_real) % 2
    ok = ((2 * d + pz < di) & (2 * hid + py < hi) & (2 * wid + px < wi)
          & (cid < 8 * cin_real))

    # ---- dx: the dual conv on the gpad views (same shape as forward)
    for s in range(bb):
        acc = None
        for zi in range(nz):
            base = g_refs[zi][s, 0]                  # (hpi, wpi, co8)
            rolled = _roll_w(base, interpret)
            for qy in range(2):
                for qx, xv in ((0, base), (1, rolled)):
                    rows = xv[qy:qy + hci].reshape(hci * wpi, co8)
                    part = jnp.dot(rows, wd_ref[(zi * 2 + qy) * 2 + qx],
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
        y = acc.reshape(hci, wpi, c8)
        dx_ref[s] = jnp.where(ok, y, 0.0).reshape(
            1, hci, wpi, c8).astype(dx_ref.dtype)

    # ---- dW: g-cell d (= gpad view qz=1, H/W front-shifted) x tap views
    @pl.when(jnp.logical_and(bi == 0, d == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(d < dco)
    def _():
        for s in range(bb):
            gblk = g_refs[1][s, 0]                   # gpad[d+1] = g cell d
            grows = _roll_w(gblk, interpret)[1:1 + hco, :wcx, :]
            grows = grows.reshape(hco * wcx, co8)
            _dw_taps(x_refs, grows, dw_ref, s, nz=nz, hco=hco, wcx=wcx,
                     c8=c8, co8=co8, interpret=interpret)


def _dw_impl() -> str:
    """dW tap-product formulation: 'wide' (default) concatenates the nq
    tap views along the LHS lane axis and issues ONE (K, nq*c8) x
    (K, co8) gemm per sample — the per-tap gemms have M = c8 (8·C_in,
    e.g. 16 lanes for C_in 2), so the serial per-tap accumulate chain
    runs the MXU at M/128 utilization (the round-4 roofline's named
    backward residual); the wide form fills M across taps.  'taps' keeps
    the per-tap accumulated sub-gemms.  Same-session bench A/B (r5):
    unet 170.2 -> 173.3 vol/s, cae 46.4 -> 46.8 — wide is the default."""
    return os.environ.get("STROKE_TPU_DW", "wide")


def _dw_taps(x_refs, grows, dw_ref, s, *, nz: int, hco: int, wcx: int,
             c8: int, co8: int, interpret: bool):
    """One sample's dW contribution: (tap view x cotangent) for the
    nz*4 superpatch taps, accumulated into the VMEM-resident dw_ref."""
    if _dw_impl() == "wide":
        packs = []
        for zi in range(nz):
            base = x_refs[zi][s, 0]
            rolled = _roll_w(base, interpret)
            for qy in range(2):
                for _qx, xv in ((0, base), (1, rolled)):
                    packs.append(xv[qy:qy + hco].reshape(hco * wcx, c8))
        wideX = jnp.concatenate(packs, axis=1)       # (K, nq*c8)
        dw_ref[:] = dw_ref[:] + jax.lax.dot_general(
            wideX, grows, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(
                nz * 4, c8, co8)
        return
    for zi in range(nz):
        base = x_refs[zi][s, 0]
        rolled = _roll_w(base, interpret)
        for qy in range(2):
            for qx, xv in ((0, base), (1, rolled)):
                rows = xv[qy:qy + hco].reshape(hco * wcx, c8)
                qi = (zi * 2 + qy) * 2 + qx
                dw_ref[qi] += jax.lax.dot_general(
                    rows, grows, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)


def _dx_kernel(*refs, nz: int, hci: int, wpi: int, c8: int,
               dx_logical, cin_real: int, bb: int, interpret: bool):
    """dx only: the dual conv on the cell-padded cotangent (the first
    half of :func:`_bwd_kernel`), used when the fused pass would exceed
    the TPU's scoped-VMEM limit (full-resolution decoder layers)."""
    g_refs = refs[:nz]
    wd_ref, dx_ref = refs[nz], refs[nz + 1]
    d = pl.program_id(1)
    di, hi, wi = dx_logical
    cid = jax.lax.broadcasted_iota(jnp.int32, (hci, wpi, c8), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (hci, wpi, c8), 0)
    wid = jax.lax.broadcasted_iota(jnp.int32, (hci, wpi, c8), 1)
    pz = (cid // (4 * cin_real)) % 2
    py = (cid // (2 * cin_real)) % 2
    px = (cid // cin_real) % 2
    ok = ((2 * d + pz < di) & (2 * hid + py < hi) & (2 * wid + px < wi)
          & (cid < 8 * cin_real))
    for s in range(bb):
        acc = None
        for zi in range(nz):
            base = g_refs[zi][s, 0]
            rolled = _roll_w(base, interpret)
            for qy in range(2):
                for qx, xv in ((0, base), (1, rolled)):
                    rows = xv[qy:qy + hci].reshape(hci * wpi,
                                                   base.shape[-1])
                    part = jnp.dot(rows, wd_ref[(zi * 2 + qy) * 2 + qx],
                                   preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
        y = acc.reshape(hci, wpi, c8)
        dx_ref[s] = jnp.where(ok, y, 0.0).reshape(
            1, hci, wpi, c8).astype(dx_ref.dtype)


def _dw_kernel(*refs, nz: int, hco: int, wcx: int, c8: int, co8: int,
               bb: int, interpret: bool):
    """dW only: per-g-cell (tap view x cotangent) accumulation (the
    second half of :func:`_bwd_kernel`)."""
    g_ref = refs[0]
    x_refs = refs[1:1 + nz]
    dw_ref = refs[1 + nz]
    bi, d = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, d == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for s in range(bb):
        gblk = g_ref[s, 0]
        grows = _roll_w(gblk, interpret)[1:1 + hco, :wcx, :]
        grows = grows.reshape(hco * wcx, co8)
        _dw_taps(x_refs, grows, dw_ref, s, nz=nz, hco=hco, wcx=wcx,
                 c8=c8, co8=co8, interpret=interpret)


def _compiler_params():
    """Raise Mosaic's default 16MB scoped-VMEM ceiling: the CAE's
    full-resolution decoder layers legitimately stage ~20MB of
    double-buffered blocks (v5e has 128MB VMEM)."""
    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _batch_block(b: int, per_b_bytes: int,
                 budget: int = 32 * 1024 * 1024) -> int:
    """Largest divisor of the batch whose per-grid-step footprint stays
    under ``budget`` (double-buffered against the 96MB scoped-VMEM
    ceiling).  Processing bb samples per grid step amortizes the
    per-step overhead that dominates at (1, 1, H, W, C) blocks.

    STROKE_TPU_BB='auto' computes the largest in-budget divisor; an
    integer forces a block size (rounded DOWN to a divisor of the batch
    — the grid is b // bb steps, so a non-divisor would silently drop
    the trailing samples).  Unset currently means 1 (the per-sample
    grid): the blocked kernels are correctness-verified but their TPU
    A/B is pending, so the proven grid stays the default."""
    force = os.environ.get("STROKE_TPU_BB", "1")
    if force != "auto":
        bb = max(1, min(int(force), b))
        while b % bb:
            bb -= 1
        return bb
    for bb in range(b, 0, -1):
        if b % bb == 0 and bb * per_b_bytes <= budget:
            return bb
    return 1


# Budget for one grid step of the FUSED bwd kernel (the estimate below
# undercounts Pallas' double buffering by ~2x, hence the headroom vs the
# 96MB ceiling); past it the pass splits into separate dx / dW kernels,
# each roughly half the footprint, paying one extra DMA sweep of the
# cotangent
_BWD_FUSED_VMEM_BUDGET = 40 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("modes", "in_logical", "cin", "interpret",
                              "with_dx"))
def _s2d_conv_bwd_p(gpad, xz, wd, *, modes, in_logical, cin, interpret,
                    with_dx=True):
    """dx+dW pallas pass — fused when the blocks fit the scoped-VMEM
    budget, split into two kernels otherwise.  gpad: cell-padded masked
    cotangent (B, dzo+2*, hpo+2, wpi, co8) (* z already padded per
    mode); xz: the (z-padded for 's') forward input cells
    (B, dzi*, hci, wcx, c8); wd: dual superpatch weights (nq, co8, c8).
    Returns (dx_cells (B, dzi, hci, wpi, c8), dwq (nq, c8, co8) f32)."""
    d, h, w, _ = in_logical
    dzi, hci = _cells(d), _cells(h)
    do = d - 2 if modes[0] == "v" else d
    dco = _cells(do)
    b, _, hpi, wpi, co8 = gpad.shape
    _, _, _, wcx, c8 = xz.shape
    nz = 2 if modes[0] == "v" else 3
    nq = nz * 4
    assert wd.shape[0] == nq, (wd.shape, nq)
    wce = min(wcx, wpi)

    esz = jnp.dtype(gpad.dtype).itemsize
    per_b = (nz * (hpi * wpi * co8 + hci * wcx * c8) * esz  # refs
             + hci * wpi * c8 * esz                         # dx out
             + hci * wpi * max(c8, co8) * (4 + esz))        # acc+roll
    bb = _batch_block(b, per_b,
                      budget=_BWD_FUSED_VMEM_BUDGET
                      - 2 * nq * co8 * c8 * esz)

    def gspec(qz):
        return pl.BlockSpec((bb, 1, hpi, wpi, co8),
                            lambda b, d, qz=qz: (b, d + qz, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    dzx = xz.shape[1]

    def xspec(qz):
        return pl.BlockSpec(
            (bb, 1, hci, wcx, c8),
            lambda b, d, qz=qz: (b, jnp.minimum(d + qz, dzx - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)

    wd_spec = pl.BlockSpec((nq, co8, c8), lambda b, d: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    dx_spec = pl.BlockSpec((bb, 1, hci, wpi, c8),
                           lambda b, d: (b, d, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    dw_spec = pl.BlockSpec((nq, c8, co8), lambda b, d: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    dx_shape = jax.ShapeDtypeStruct((b, dzi, hci, wpi, c8), xz.dtype)
    dw_shape = jax.ShapeDtypeStruct((nq, c8, co8), jnp.float32)

    fused_bytes = bb * per_b + 2 * nq * co8 * c8 * esz      # + wd + dw
    if with_dx and fused_bytes <= _BWD_FUSED_VMEM_BUDGET:
        kern = functools.partial(
            _bwd_kernel, nz=nz, hco=hci - 1, hci=hci, wpi=wpi, wcx=wce,
            c8=c8, co8=co8, dco=dco, dx_logical=(d, h, w), cin_real=cin,
            bb=bb, interpret=interpret)
        dx, dwq = pl.pallas_call(
            kern,
            grid=(b // bb, dzi),
            in_specs=[gspec(qz) for qz in range(nz)]
            + [xspec(qz) for qz in range(nz)] + [wd_spec],
            out_specs=(dx_spec, dw_spec),
            out_shape=(dx_shape, dw_shape),
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(*([gpad] * nz), *([xz] * nz), wd)
        return dx, dwq

    dx = None
    if with_dx:
        dx = pl.pallas_call(
            functools.partial(_dx_kernel, nz=nz, hci=hci, wpi=wpi, c8=c8,
                              dx_logical=(d, h, w), cin_real=cin,
                              bb=bb, interpret=interpret),
            grid=(b // bb, dzi),
            in_specs=[gspec(qz) for qz in range(nz)] + [wd_spec],
            out_specs=dx_spec,
            out_shape=dx_shape,
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(*([gpad] * nz), wd)

    def gspec_dw(b_, d_):
        return (b_, d_ + 1, 0, 0, 0)

    dwq = pl.pallas_call(
        functools.partial(_dw_kernel, nz=nz, hco=hci - 1, wcx=wce, c8=c8,
                          co8=co8, bb=bb, interpret=interpret),
        grid=(b // bb, dco),
        in_specs=[pl.BlockSpec((bb, 1, hpi, wpi, co8), gspec_dw,
                               memory_space=pltpu.VMEM)]
        + [xspec(qz) for qz in range(nz)],
        out_specs=dw_spec,
        out_shape=dw_shape,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(gpad, *([xz] * nz))
    return dx, dwq


# ---------------------------------------------------------------------------
# Differentiable s2d conv
# ---------------------------------------------------------------------------

def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _prep(cells, kernel, bias, modes):
    """Build the superpatch operands, row/column-padded to the lane
    layout (real parity-major channels first, zero lanes after).

    ``bias`` is (C_out,) — one row, broadcast to every grid step — or a
    per-output-plane (D_out, C_out) table (the z-SAME BN fold,
    :func:`fold_bn_zsame`), laid out one row per DEPTH CELL with the
    plane parity encoded in the lane index (lane = ((pz*2+py)*2+px)*co
    + c, matching the kernel's parity-major channel order)."""
    c8 = cells.shape[-1]
    ci, co = kernel.shape[3], kernel.shape[4]
    co8 = _round_up(8 * co, 128)
    wmats = superpatch_weights(kernel.astype(cells.dtype), modes)
    wmats = jnp.pad(wmats, ((0, 0), (0, c8 - 8 * ci), (0, co8 - 8 * co)))
    if bias.ndim == 2:
        do = bias.shape[0]
        dco = _cells(do)
        bz = jnp.pad(bias.astype(jnp.float32),
                     ((0, 2 * dco - do), (0, 0)))
        bz = bz.reshape(dco, 2, co)                     # (dcell, pz, co)
        brow = jnp.concatenate([bz[:, r >> 2, :] for r in range(8)],
                               axis=-1)                 # (dco, 8*co)
        brow = jnp.pad(brow, ((0, 0), (0, co8 - 8 * co)))
        # 8x sublane repeat: Mosaic requires the trailing block dims be
        # (8k, 128k) or equal to the array dims, so a (1, co8) per-cell
        # row block is not lowerable — each grid step reads an (8, co8)
        # block of identical rows instead (few KB total)
        return wmats, jnp.repeat(brow, 8, axis=0), co8
    brow = jnp.pad(jnp.tile(bias.astype(jnp.float32), 8), (0, co8 - 8 * co))
    return wmats, brow.reshape(1, co8), co8


def _zpad(cells, modes):
    if modes[0] == "s":
        return jnp.pad(cells, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    return cells


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _s2d_conv(cells, kernel, bias, in_logical, modes, act, alpha,
              input_grad=True):
    interpret = _interpret_default()
    wmats, brow, _ = _prep(cells, kernel, bias, modes)
    return _s2d_conv_p(_zpad(cells, modes), wmats, brow, modes=modes,
                       act=act, alpha=alpha, in_logical=in_logical,
                       cout=int(kernel.shape[4]), out_dtype=cells.dtype,
                       interpret=interpret)


def _s2d_conv_fwd(cells, kernel, bias, in_logical, modes, act, alpha,
                  input_grad=True):
    y = _s2d_conv(cells, kernel, bias, in_logical, modes, act, alpha,
                  input_grad)
    return y, (cells, kernel, bias, y)


def _out_mask(shape_cells, out_logical, cout_real, dtype):
    """(Dco, Hco, Wcp, 8*Cop) validity mask matching the kernel's."""
    _, dco, hco, wcp, co8 = shape_cells
    do, ho, wo = out_logical
    zid = jax.lax.broadcasted_iota(jnp.int32, (dco, hco, wcp, co8), 0)
    hid = jax.lax.broadcasted_iota(jnp.int32, (dco, hco, wcp, co8), 1)
    wid = jax.lax.broadcasted_iota(jnp.int32, (dco, hco, wcp, co8), 2)
    cid = jax.lax.broadcasted_iota(jnp.int32, (dco, hco, wcp, co8), 3)
    pz = (cid // (4 * cout_real)) % 2
    py = (cid // (2 * cout_real)) % 2
    px = (cid // cout_real) % 2
    ok = ((2 * zid + pz < do) & (2 * hid + py < ho) & (2 * wid + px < wo)
          & (cid < 8 * cout_real))
    return ok


def _s2d_conv_bwd(in_logical, modes, act, alpha, input_grad, res, g):
    cells, kernel, bias, y = res
    d, h, w, c = in_logical
    do = d - 2 if modes[0] == "v" else d
    ho, wo = h - 2, w - 2
    ci, co = kernel.shape[3], kernel.shape[4]
    c8, co8 = cells.shape[-1], y.shape[-1]
    interpret = _interpret_default()

    # activation gradient from the output; mask the cotangent so garbage
    # slots (whose forward value is the constant 0) contribute nothing;
    # all at the engine dtype — one bandwidth-bound pass
    cdt = cells.dtype
    ok = _out_mask(y.shape, (do, ho, wo), co, y.dtype)
    one = jnp.asarray(1.0, cdt)
    if act == "leaky_relu":
        dact = jnp.where(y > 0, one, jnp.asarray(alpha, cdt))
    elif act == "elu":
        dact = jnp.where(y > 0, one,
                         y.astype(cdt) + jnp.asarray(alpha, cdt))
    else:
        dact = one
    gpb = jnp.where(ok, g.astype(cdt) * dact, 0)

    # d(bias): sum over all valid voxels, folding the 8 output parities;
    # a per-plane (D_out, C_out) bias keeps its depth axis (pz parity
    # interleaved back into plane order)
    gp8 = gpb[..., :8 * co].reshape(gpb.shape[:-1] + (8, co))
    if bias.ndim == 2:
        dco = gpb.shape[1]
        g6 = gp8.reshape(gp8.shape[:4] + (2, 4, co))      # (..., pz, pypx, co)
        db = jnp.sum(g6, axis=(0, 2, 3, 5), dtype=jnp.float32)  # (dco, 2, co)
        db = db.reshape(2 * dco, co)[:bias.shape[0]]
    else:
        db = jnp.sum(gp8, axis=(0, 1, 2, 3, 4), dtype=jnp.float32)

    # dx + dW in ONE fused pallas pass: dx is the dual conv (flipped,
    # ci<->co transposed weights) over the cell-padded cotangent; dW
    # accumulates (tap view x cotangent) per grid step in VMEM
    kd = jnp.swapaxes(jnp.flip(kernel, (0, 1, 2)), 3, 4)   # (3,3,3,co,ci)
    wd = superpatch_weights(kd.astype(cdt), modes)
    wd = jnp.pad(wd, ((0, 0), (0, co8 - 8 * co), (0, c8 - 8 * ci)))
    zpad = (0, 0) if modes[0] == "s" else (1, 1)
    gpad = jnp.pad(gpb, ((0, 0), zpad, (1, 1), (1, 0), (0, 0)))
    wcp_dx = _round_up(gpad.shape[3], 8)
    gpad = jnp.pad(gpad, ((0, 0),) * 3 + ((0, wcp_dx - gpad.shape[3]),
                                          (0, 0)))
    dxc, dwq = _s2d_conv_bwd_p(
        _zpad(gpad, modes), _zpad(cells, modes), wd, modes=modes,
        in_logical=in_logical, cin=ci, interpret=interpret,
        with_dx=input_grad)
    if not input_grad:
        # entry convs (input is DATA, never differentiated): the dx half
        # of the backward is skipped entirely — a zero cotangent lets
        # XLA DCE the whole upstream chain
        dxc = jnp.zeros_like(cells)
    else:
        # physical grid of dx == grid of cells (z/h exact; w by
        # construction)
        wcp = cells.shape[3]
        if dxc.shape[3] > wcp:
            dxc = dxc[:, :, :, :wcp, :]
        elif dxc.shape[3] < wcp:
            dxc = jnp.pad(dxc,
                          ((0, 0),) * 3 + ((0, wcp - dxc.shape[3]), (0, 0)))
        assert dxc.shape == cells.shape, (dxc.shape, cells.shape)

    # fold the per-shift dW back onto the 27 taps via the tap table
    T = np.asarray(_tap_table(modes))                     # (nq, 8, 8)
    onehot = jnp.asarray(
        (T[..., None] == np.arange(27)).astype(np.float32))
    dwq = dwq[:, :8 * ci, :8 * co]
    dw = jnp.einsum("qpiao,qpat->tio",
                    dwq.reshape(-1, 8, ci, 8, co), onehot)
    dk = dw.reshape(3, 3, 3, ci, co)

    return dxc.astype(cells.dtype), dk.astype(kernel.dtype), \
        db.astype(jnp.float32)


_s2d_conv.defvjp(_s2d_conv_fwd, _s2d_conv_bwd)


def s2d_conv(s: S2d, kernel: jnp.ndarray, bias: jnp.ndarray,
             act: str = "none", alpha: float = 0.01,
             modes: Tuple[str, str, str] = ("v", "v", "v"),
             input_grad: bool = True) -> S2d:
    """Fused (folded-BN) conv + bias + activation on an s2d tensor.

    kernel: (3, 3, 3, C_in, C_out) float32; bias: (C_out,), or a
    per-output-plane (D_out, C_out) table (:func:`fold_bn_zsame`).
    modes: per-axis 'v' (valid) or 's' (pad-1 SAME); even pads are applied
    by the caller via :func:`s2d_cell_pad`.
    ``input_grad=False`` marks an ENTRY conv whose input is data: the
    backward runs the dW kernel only (the fused dx+dW pallas pass cannot
    be dead-code-eliminated by XLA, so the caller must declare it).
    """
    d, h, w, c = s.logical
    assert kernel.shape[3] == c, (kernel.shape, s.logical)
    out = _s2d_conv(s.cells, kernel, bias, s.logical, tuple(modes), act,
                    float(alpha), bool(input_grad))
    do = d - 2 if modes[0] == "v" else d
    return S2d(out, (do, h - 2, w - 2, int(kernel.shape[4])))


# ---------------------------------------------------------------------------
# Strided / transposed / 1x1 convolutions in the s2d domain
#
# A stride-2 3^3 conv consumes a 2-cell window per axis and emits ONE
# voxel per cell (the output grid IS the cell grid), and a stride-2
# transposed conv consumes one logical voxel per OUTPUT CELL — both are
# plain dense einsums over cell-shifted views, MXU-shaped without any
# im2col, so XLA handles them well at the low resolutions where they
# occur (reference: Cae3D.py encoder strided layers / decoder
# ConvTranspose3d layers).
# ---------------------------------------------------------------------------

def _valid_mask(shape_cells, logical_dhw, c_real):
    """(Dc, Hc, Wc, L) bool mask of in-extent (parity-major) slots."""
    dc, hc, wc, L = shape_cells[-4:]
    do, ho, wo = logical_dhw
    zid = jax.lax.broadcasted_iota(jnp.int32, (dc, hc, wc, L), 0)
    hid = jax.lax.broadcasted_iota(jnp.int32, (dc, hc, wc, L), 1)
    wid = jax.lax.broadcasted_iota(jnp.int32, (dc, hc, wc, L), 2)
    cid = jax.lax.broadcasted_iota(jnp.int32, (dc, hc, wc, L), 3)
    pz = (cid // (4 * c_real)) % 2
    py = (cid // (2 * c_real)) % 2
    px = (cid // c_real) % 2
    return ((2 * zid + pz < do) & (2 * hid + py < ho) & (2 * wid + px < wo)
            & (cid < 8 * c_real))


def s2d_affine(s: S2d, scale: jnp.ndarray, shift: jnp.ndarray) -> S2d:
    """Per-channel affine (the BN normalization) applied IN the s2d
    domain, masked to preserve the zero invariant.  Used before ops whose
    boundary zero-padding makes the affine unfoldable (strided convs).

    ``scale``/``shift``: (C,), or (G, C) for a batch-grouped affine where
    the batch axis is G equal groups stacked major (structure-batched CAE
    passes: each group is one structure with its own BN statistics)."""
    c = s.logical[3]
    L = s.cells.shape[-1]

    def lanes(v):
        return jnp.pad(jnp.tile(v.astype(jnp.float32), (1, 8)),
                       ((0, 0), (0, L - 8 * c)))

    s2 = jnp.atleast_2d(scale)
    t2 = jnp.atleast_2d(shift)
    g = s2.shape[0]
    b = s.cells.shape[0]
    assert b % g == 0, (b, g)
    # (B, 1, 1, 1, L) rows: group-major batch stacking
    sl = jnp.repeat(lanes(s2), b // g, axis=0)[:, None, None, None, :]
    tl = jnp.repeat(lanes(t2), b // g, axis=0)[:, None, None, None, :]
    ok = _valid_mask(s.cells.shape, s.logical[:3], c)
    out = jnp.where(ok, s.cells.astype(jnp.float32) * sl + tl, 0.0)
    return S2d(out.astype(s.cells.dtype), s.logical)


@functools.lru_cache(maxsize=None)
def _stride2_tap_table(pad: int) -> np.ndarray:
    """T[q (2^3 cell shifts), p (in-cell parity)] = flat tap index or 27.
    out[i] = sum_t k[t] * x[2i + t - pad] per axis; the window is cells
    {i-pad+q : q in 0..1}."""
    T = np.full((8, 8), 27, np.int64)
    for q in range(8):
        qz, qy, qx = q >> 2 & 1, q >> 1 & 1, q & 1
        for p in range(8):
            pz, py, px = p >> 2 & 1, p >> 1 & 1, p & 1
            # voxel offset rel output voxel 2i: d = 2(q-pad)+p ; t = d+pad
            ts = [2 * (qq - pad) + pp + pad
                  for qq, pp in ((qz, pz), (qy, py), (qx, px))]
            if all(0 <= t < 3 for t in ts):
                T[q, p] = (ts[0] * 3 + ts[1]) * 3 + ts[2]
    return T


def s2d_conv_stride2(s: S2d, kernel: jnp.ndarray, bias: jnp.ndarray,
                     act: str = "none", alpha: float = 1.0,
                     pad: int = 1) -> jnp.ndarray:
    """Stride-2 3^3 conv (torch padding=pad in {0, 1}) on an s2d tensor,
    returning the LOGICAL half-resolution output (B, D', H', W', C_out).
    8 cell-shifted einsums, K = 8*C_in lanes, N = C_out."""
    d, h, w, ci = s.logical
    co = kernel.shape[-1]
    T = _stride2_tap_table(pad)
    k4 = jnp.concatenate([kernel.reshape(27, ci, co),
                          jnp.zeros((1, ci, co), kernel.dtype)])
    cells = s.cells[..., :8 * ci]
    if pad:
        nzo = (_cells(d), _cells(h), _cells(w))
        cells = jnp.pad(cells, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))
    else:
        nzo = (_cells(d) - 1, _cells(h) - 1, _cells(w) - 1)
    out = None
    cdt = cells.dtype
    for q in range(8):
        qz, qy, qx = q >> 2 & 1, q >> 1 & 1, q & 1
        wq = k4[T[q]]                                   # (8, ci, co)
        wq = wq.reshape(8 * ci, co).astype(cdt)
        xv = cells[:, qz:qz + nzo[0], qy:qy + nzo[1], qx:qx + nzo[2], :]
        part = jnp.einsum("bzhwk,kn->bzhwn", xv, wq,
                          preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    out = _act(out + bias.astype(jnp.float32), act, alpha)
    return out.astype(cdt)


@functools.lru_cache(maxsize=None)
def _ct_tap_table(k: int) -> np.ndarray:
    """Transposed conv with lax.conv_transpose(transpose_kernel=False)
    semantics (what flax nn.ConvTranspose computes; the kernel reads
    MIRRORED relative to torch's w[o - 2i]): out[2j + p] =
    sum_i w[k-1 - (2j + p - 2i)] x[i].
    k=3: window cells {j-1+q : q in 0..1}, t = 2q - p;
    k=2: window {j}, t = 1 - p.
    T[q, p] per axis -> flat tap or k^3 (zero)."""
    nq = 8 if k == 3 else 1
    T = np.full((nq, 8), k ** 3, np.int64)
    for q in range(nq):
        qz, qy, qx = q >> 2 & 1, q >> 1 & 1, q & 1
        for p in range(8):
            pz, py, px = p >> 2 & 1, p >> 1 & 1, p & 1
            if k == 3:
                ts = [2 * qq - pp
                      for qq, pp in ((qz, pz), (qy, py), (qx, px))]
            else:
                ts = [1 - pz, 1 - py, 1 - px]
            if all(0 <= t < k for t in ts):
                T[q, p] = (ts[0] * k + ts[1]) * k + ts[2]
    return T


def ct_stride2_to_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray, act: str = "none",
                      alpha: float = 1.0) -> S2d:
    """Stride-2 transposed conv (torch ConvTranspose3d(k, 2), k in
    {2, 3}) from a LOGICAL input directly INTO the s2d domain: the
    output cell grid is the input voxel grid, so each output cell is a
    dense product of a (k-1)^3+?-cell input window — one einsum per
    cell shift (k=3: 8 shifts; k=2: 1), K = C_in, N = 8*C_out lanes."""
    b, d, h, w, ci = x.shape
    k = int(kernel.shape[0])
    co = kernel.shape[-1]
    T = _ct_tap_table(k)
    kf = jnp.concatenate([kernel.reshape(k ** 3, ci, co),
                          jnp.zeros((1, ci, co), kernel.dtype)])
    out_log = ((2 * d + 1, 2 * h + 1, 2 * w + 1, co) if k == 3
               else (2 * d, 2 * h, 2 * w, co))
    dc, hc, wc = _cells(out_log[0]), _cells(out_log[1]), _cells(out_log[2])
    wcp = _round_up(wc, 8)
    cdt = x.dtype
    out = None
    if k == 3:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, wcp - wc + 1), (0, 0)))
        for q in range(T.shape[0]):
            qz, qy, qx = q >> 2 & 1, q >> 1 & 1, q & 1
            wq = jnp.transpose(kf[T[q]], (1, 0, 2)).reshape(
                ci, 8 * co).astype(cdt)                # (ci, (a, co))
            xv = xp[:, qz:qz + dc, qy:qy + hc, qx:qx + wcp, :]
            part = jnp.einsum("bzhwk,kn->bzhwn", xv, wq,
                              preferred_element_type=jnp.float32)
            out = part if out is None else out + part
    else:
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wcp - wc), (0, 0)))
        wq = jnp.transpose(kf[T[0]], (1, 0, 2)).reshape(
            ci, 8 * co).astype(cdt)
        out = jnp.einsum("bzhwk,kn->bzhwn", xp, wq,
                         preferred_element_type=jnp.float32)
    out = _act(out + jnp.tile(bias, 8).astype(jnp.float32), act, alpha)
    ok = _valid_mask(out.shape, out_log[:3], co)
    out = jnp.where(ok, out, 0.0).astype(cdt)
    L = _round_up(8 * co, 128)
    if L != 8 * co:
        out = jnp.pad(out, ((0, 0),) * 4 + ((0, L - 8 * co),))
    return S2d(out, out_log)


def s2d_conv1x1(s: S2d, kernel: jnp.ndarray, bias: jnp.ndarray,
                act: str = "none", alpha: float = 1.0) -> S2d:
    """1^3 conv in the s2d domain: a block-diagonal lane matmul
    (kron(I8, k)), K = 8*C_in, N = 8*C_out — no unpacking needed."""
    d, h, w, ci = s.logical
    co = kernel.shape[-1]
    k2 = kernel.reshape(ci, co)
    eye = jnp.asarray(np.eye(8, dtype=np.float32))
    wfull = jnp.einsum("pq,io->piqo", eye, k2).reshape(8 * ci, 8 * co)
    cdt = s.cells.dtype
    out = jnp.einsum("bzhwk,kn->bzhwn", s.cells[..., :8 * ci],
                     wfull.astype(cdt), preferred_element_type=jnp.float32)
    out = _act(out + jnp.tile(bias, 8).astype(jnp.float32), act, alpha)
    out_log = (d, h, w, co)
    ok = _valid_mask(out.shape, (d, h, w), co)
    out = jnp.where(ok, out, 0.0).astype(cdt)
    L = _round_up(8 * co, 128)
    if L != 8 * co:
        out = jnp.pad(out, ((0, 0),) * 4 + ((0, L - 8 * co),))
    return S2d(out, out_log)


def upsample2x_to_s2d(x: jnp.ndarray) -> S2d:
    """2x trilinear upsample (align_corners, torch-0.3 ``Upsample`` —
    reference Unet3D.py:44,46) emitted directly INTO the s2d cell
    layout: the output cell grid equals the input voxel grid, so the op
    is three pairs of per-output-parity axis matmuls (the resize matrix
    split by row parity) plus one lane stack — the full-resolution
    tensor never exists in logical layout and the decoder stages skip
    their ``s2d_pack`` re-layout entirely."""
    from stroke_prediction_tpu.ops.resize import _linear_matrix

    b, d, h, w, c = x.shape
    parts = {(): x}
    for axis, n in ((1, d), (2, h), (3, w)):
        A = _linear_matrix(n, 2 * n, True)
        mats = (A[0::2], A[1::2])                     # (n, n) each
        letters = "abcde"
        axl = letters[axis]
        spec = f"{letters},Z{axl}->{letters.replace(axl, 'Z')}"
        new = {}
        for key, v in parts.items():
            for p in (0, 1):
                wmat = jnp.asarray(mats[p], v.dtype)
                new[key + (p,)] = jnp.einsum(
                    spec, v, wmat, preferred_element_type=v.dtype)
        parts = new
    cells = jnp.concatenate(
        [parts[(pz, py, px)]
         for pz in (0, 1) for py in (0, 1) for px in (0, 1)], axis=-1)
    wcp = _round_up(w, 8)
    if wcp != w:
        cells = jnp.pad(cells, ((0, 0), (0, 0), (0, 0), (0, wcp - w),
                                (0, 0)))
    L = _round_up(8 * c, 128)
    if L != 8 * c:
        cells = jnp.pad(cells, ((0, 0),) * 4 + ((0, L - 8 * c),))
    return S2d(cells, (2 * d, 2 * h, 2 * w, c))


def s2d_center_crop_cells(s: S2d,
                          target_dhw: Sequence[int]) -> Optional[S2d]:
    """Center-crop WITHIN the cell layout (no re-layout): possible when
    every crop offset is even, so the cropped tensor's cells are a plain
    slice of the source cells.  Returns None when misaligned (caller
    falls back to the logical crop+pack path).  The result is re-masked
    to restore the zero invariant (source-valid voxels beyond the target
    extent must read as zero)."""
    d, h, w, c = s.logical
    td, th, tw = target_dhw
    offs = ((d - td) // 2, (h - th) // 2, (w - tw) // 2)
    if any(o % 2 for o in offs) or any(t % 2 for t in (td, th, tw)):
        return None
    zo, yo, xo = (o // 2 for o in offs)
    dc, hc, wc = _cells(td), _cells(th), _cells(tw)
    wcp = _round_up(wc, 8)
    cells = s.cells[:, zo:zo + dc, yo:yo + hc, xo:xo + wcp, :]
    if cells.shape[3] < wcp:
        cells = jnp.pad(cells, ((0, 0),) * 3
                        + ((0, wcp - cells.shape[3]), (0, 0)))
    out_log = (td, th, tw, c)
    ok = _valid_mask(cells.shape, (td, th, tw), c)
    cells = jnp.where(ok, cells, 0)
    return S2d(cells, out_log)


def s2d_concat_channels(a: S2d, b: S2d) -> S2d:
    """Channel concat IN the s2d domain: a per-parity lane interleave
    ((p, ca) ++ (p, cb) -> (p, ca+cb)) — lane-granularity only, the
    sublane/spatial layout is untouched (vs a full re-layout for
    logical concat + pack)."""
    assert a.logical[:3] == b.logical[:3], (a.logical, b.logical)
    ca, cb = a.logical[3], b.logical[3]
    sh = a.cells.shape[:-1]
    wc = max(a.cells.shape[3], b.cells.shape[3])

    def body(x, c):
        if x.shape[3] < wc:
            x = jnp.pad(x, ((0, 0),) * 3 + ((0, wc - x.shape[3]), (0, 0)))
        return x[..., :8 * c].reshape(x.shape[:-1] + (8, c))

    out = jnp.concatenate([body(a.cells, ca), body(b.cells, cb)], axis=-1)
    out = out.reshape(sh[:3] + (wc, 8 * (ca + cb)))
    L = _round_up(8 * (ca + cb), 128)
    if L != 8 * (ca + cb):
        out = jnp.pad(out, ((0, 0),) * 4 + ((0, L - 8 * (ca + cb)),))
    return S2d(out, a.logical[:3] + (ca + cb,))


# ---------------------------------------------------------------------------
# Masked batch statistics (for BN folding)
# ---------------------------------------------------------------------------

def s2d_batch_stats(s: S2d, groups: int = 1
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (mean, biased var) over the LOGICAL extent.  Exact
    thanks to the zero invariant: sums over all slots equal sums over
    valid voxels; the divisor is the true count.

    ``groups`` > 1 splits the (group-major) batch axis into G equal
    groups and returns (G, C) statistics — the structure-batched CAE
    passes keep the reference's per-structure BN semantics this way."""
    d, h, w, c = s.logical
    b = s.cells.shape[0]
    assert b % groups == 0, (b, groups)
    n = (b // groups) * d * h * w
    x8 = s.cells[..., :8 * c].reshape(
        (groups, b // groups) + s.cells.shape[1:-1] + (8, c)
    ).astype(jnp.float32)
    ssum = jnp.sum(x8, axis=(1, 2, 3, 4, 5))
    ssq = jnp.sum(x8 * x8, axis=(1, 2, 3, 4, 5))
    mean = ssum / n
    var = ssq / n - mean * mean
    var = jnp.maximum(var, 0.0)
    if groups == 1:
        return mean[0], var[0]
    return mean, var


def fold_bn(kernel: jnp.ndarray, bias: jnp.ndarray, scale: jnp.ndarray,
            shift: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold a per-input-channel affine (x*scale + shift) into (kernel,
    bias): conv(x*s + t) = conv_{k*s}(x) + t @ sum_taps(k)."""
    k2 = kernel * scale[None, None, None, :, None]
    b2 = bias + jnp.einsum("zyxio,i->o", kernel, shift)
    return k2, b2


def fold_bn_zsame(kernel: jnp.ndarray, bias: jnp.ndarray,
                  scale: jnp.ndarray, shift: jnp.ndarray,
                  d_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold a per-input-channel affine into a z-SAME (pad 1), H/W-VALID
    3^3 conv: ``conv(pad_z(x*s + t)) = conv_{k*s}(pad_z(x)) + B(z)``
    where the bias table ``B`` equals the full-tap fold everywhere except
    the first/last output plane (the padded z tap reads a ZERO there, not
    ``t`` — zero-padding happens AFTER the affine in the reference,
    Cae3D.py:44-56).  Returns (kernel', (d_out, C_out) bias table); the
    conv kernel consumes the table directly (its grid steps are depth
    cells), so BN scale/shift gradients flow through kernel'/B even with
    ``input_grad=False`` — the legal form of the entry-conv dx skip."""
    k2 = kernel * scale[None, None, None, :, None]
    per_tap = jnp.einsum("zyxio,i->zo", kernel, shift)     # (3, C_out)
    bz = jnp.tile(bias + per_tap.sum(0), (d_out, 1))
    bz = bz.at[0].add(-per_tap[0])            # z_in = -1 is pad, not t
    bz = bz.at[d_out - 1].add(-per_tap[2])    # z_in = D is pad, not t
    return k2, bz

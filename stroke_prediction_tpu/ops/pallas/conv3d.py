"""Fused 3-D convolution Pallas TPU kernel (valid, stride 1, 3x3x3).

Why: the stroke models' conv layers have 2-64 channels; the MXU computes
``2 * 128 * N`` FLOPs per streamed row, so with N = C_out = 16 XLA's conv
tops out at ~2-6 TF/s on v5e regardless of K (measured,
tools/perf_probe.py).  This kernel packs the 2x2x2 output neighborhood
into the matmul's N dimension (output space-to-depth), turning the conv
into a single dense ``(rows, 64*C_in) @ (64*C_in, 8*C_out)`` product per
tile — N = 8*C_out reaches the MXU's native 128 lanes at C_out = 16.

Pipeline (conv3d_s2d):
  1. XLA: zero-pad (D, H, W) to even and space-to-depth the input to
     coarse cells ``(B, Dc, Hc, Wc, 8*C_in)`` (parity-major channels).
  2. XLA: transform the (3, 3, 3, C_in, C_out) kernel to the superpatch
     weight matrix ``(64*C_in, 8*C_out)``: entry [(q, p, ci), (a, co)] =
     k[2q+p-a, ci, co] per axis, zero where out of the 3-tap range.
  3. Pallas: per (batch, coarse-z, coarse-H tile): DMA the
     ``(2, TH+1, Wc, 8C)`` halo window HBM->VMEM, build the im2col rows by
     8 unit-stride shifted slices (lane-dim concat), one MXU matmul,
     + bias, + activation (none / leaky_relu / elu), store.
  4. XLA: depth-to-space and crop to the valid-conv output size.

BatchNorm's per-channel affine is folded into (kernel, bias) OUTSIDE the
kernel by the caller (models/layers.py), so BN->conv->act is one fused
device op; activation gradients are recovered from the OUTPUT (LeakyReLU
sign trick; ELU via ``dy = y + alpha`` for y < 0), so no pre-activation
tensor is stored.  The custom VJP computes dx with the same kernel (full
correlation = s2d-conv of the padded cotangent with the flipped,
transposed kernel) and dW with a Pallas accumulation kernel over the same
s2d operands.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# XLA-side layout transforms
# ---------------------------------------------------------------------------

def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, ceil(D/2), ceil(H/2), ceil(W/2), 8C),
    zero-padding odd spatial dims; parity-major channel layout
    (pd, ph, pw, c).

    Decomposed per axis (W is a free reshape; H and D are single-axis
    interleaves) — ~2.5x faster on TPU than the naive 8-way transpose.
    """
    b, d, h, w, c = x.shape
    pd, ph, pw = d % 2, h % 2, w % 2
    if pd or ph or pw:
        x = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
    d2, h2, w2 = x.shape[1] // 2, x.shape[2] // 2, x.shape[3] // 2
    y = x.reshape(b, 2 * d2, 2 * h2, w2, 2 * c)            # (pw, c): free
    y = y.reshape(b, 2 * d2, h2, 2, w2, 2 * c)
    y = y.swapaxes(3, 4).reshape(b, 2 * d2, h2, w2, 4 * c)  # (ph, pw, c)
    y = y.reshape(b, d2, 2, h2, w2, 4 * c)
    y = jnp.moveaxis(y, 2, 4).reshape(b, d2, h2, w2, 8 * c)
    return y


def depth_to_space2(y: jnp.ndarray, out_dhw: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D2, H2, W2, 8C) -> (B, *out_dhw, C), parity-major layout
    (inverse of :func:`space_to_depth2`, also per-axis)."""
    b, d2, h2, w2, c8 = y.shape
    c = c8 // 8
    y = y.reshape(b, d2, h2, w2, 2, 4 * c)
    y = jnp.moveaxis(y, 4, 2).reshape(b, 2 * d2, h2, w2, 4 * c)
    y = y.reshape(b, 2 * d2, h2, w2, 2, 2 * c)
    y = y.swapaxes(3, 4).reshape(b, 2 * d2, 2 * h2, w2, 2 * c)
    y = y.reshape(b, 2 * d2, 2 * h2, 2 * w2, c)
    do, ho, wo = out_dhw
    return y[:, :do, :ho, :wo, :]


@functools.lru_cache(maxsize=None)
def _superpatch_tap_table() -> np.ndarray:
    """T[(q, p) superpatch index 0..63, a output-parity 0..7] = flat index
    into the 27 kernel taps, or 27 (zero row) when out of range."""
    T = np.full((64, 8), 27, np.int64)
    for qz in range(2):
        for qy in range(2):
            for qx in range(2):
                for pz in range(2):
                    for py in range(2):
                        for px in range(2):
                            sp = (((qz * 2 + qy) * 2 + qx) * 8
                                  + pz * 4 + py * 2 + px)
                            dz, dy, dx = 2 * qz + pz, 2 * qy + py, 2 * qx + px
                            for az in range(2):
                                for ay in range(2):
                                    for ax in range(2):
                                        a = az * 4 + ay * 2 + ax
                                        tz, ty, tx = dz - az, dy - ay, dx - ax
                                        if (0 <= tz < 3 and 0 <= ty < 3
                                                and 0 <= tx < 3):
                                            T[sp, a] = (tz * 3 + ty) * 3 + tx
    return T


def superpatch_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C_in, C_out) -> (64*C_in, 8*C_out) superpatch matrix."""
    _, _, _, ci, co = kernel.shape
    k3 = kernel.reshape(27, ci, co)
    k4 = jnp.concatenate([k3, jnp.zeros((1, ci, co), kernel.dtype)], axis=0)
    T = jnp.asarray(_superpatch_tap_table())          # (64, 8)
    w = k4[T]                                          # (64, 8, ci, co)
    w = jnp.transpose(w, (0, 2, 1, 3))                 # (64, ci, 8, co)
    return w.reshape(64 * ci, 8 * co)


# ---------------------------------------------------------------------------
# The forward kernel
# ---------------------------------------------------------------------------

def _act(y, act: str, alpha: float):
    if act == "leaky_relu":
        return jnp.where(y > 0, y, alpha * y)
    if act == "elu":
        return jnp.where(y > 0, y, alpha * (jnp.exp(y) - 1.0))
    return y


def _fwd_kernel(*refs, th: int, w2: int, c8: int, act: str, alpha: float,
                out_dtype):
    x_refs = refs[:8]
    w_ref, b_ref, o_ref = refs[8], refs[9], refs[10]
    # im2col as 8 accumulated matmuls over the pre-shifted tap tensors —
    # same MXU cycle count as one (rows, 64C) @ (64C, 8Co) product; all
    # blocks are regular, so Mosaic double-buffers the HBM->VMEM copies
    y = None
    for q in range(8):
        a = x_refs[q][0, 0].reshape(th * w2, c8)
        part = jnp.dot(a, w_ref[q], preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    y = y + b_ref[:]
    y = _act(y, act, alpha)
    o_ref[:] = y.reshape(1, 1, th, w2, y.shape[-1]).astype(out_dtype)


def _choose_th(h2: int, w2: int) -> int:
    # target ~256-512 rows per tile
    th = max(1, min(h2, 512 // max(w2, 1)))
    while h2 % th and th > 1 and h2 % th < th // 2:
        th -= 1
    return th


@functools.partial(jax.jit,
                   static_argnames=("act", "alpha", "out_dtype", "interpret"))
def _conv3d_s2d_fwd(x, kernel, bias, act: str = "none", alpha: float = 0.01,
                    out_dtype=jnp.bfloat16, interpret: bool = False):
    """Valid 3x3x3 conv + bias + activation via the s2d Pallas kernel.

    x: (B, D, H, W, C_in); kernel: (3,3,3,C_in,C_out); bias: (C_out,)
    Returns (B, D-2, H-2, W-2, C_out).
    """
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    do, ho, wo = d - 2, h - 2, w - 2
    d2, h2, w2 = -(-do // 2), -(-ho // 2), -(-wo // 2)

    # the (remote) Mosaic compiler wants full 128-lane blocks: pad channel
    # counts to multiples of 16 so 8*C is a multiple of 128
    cin_p = max(16, -(-cin // 16) * 16)
    cout_p = max(16, -(-cout // 16) * 16)
    if cin_p != cin:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cin_p - cin),))
        kernel = jnp.pad(kernel, ((0, 0),) * 3 + ((0, cin_p - cin), (0, 0)))
    if cout_p != cout:
        kernel = jnp.pad(kernel, ((0, 0),) * 4 + ((0, cout_p - cout),))
        bias = jnp.pad(bias, (0, cout_p - cout))
    cin, cout_real, cout = cin_p, cout, cout_p

    # W-grid padded to 8-aligned (Mosaic tiling); extra columns fall past
    # the valid output range and are dropped by the final crop
    w2p = -(-w2 // 8) * 8
    th = _choose_th(h2, w2p)
    n_ht = -(-h2 // th)
    h2p = n_ht * th

    xs = space_to_depth2(x.astype(jnp.bfloat16))       # (B, Dc, Hc, Wc, 8C)
    _, dc, hc, wc, c8 = xs.shape
    # pad so every shifted view (B, D2, h2p, w2p, c8) exists
    xs = jnp.pad(xs, ((0, 0), (0, max(0, d2 + 1 - dc)),
                      (0, max(0, h2p + 1 - hc)),
                      (0, max(0, w2p + 1 - wc)), (0, 0)))
    # 4 pre-shifted (qy, qx) tap tensors; the qz shift costs nothing — the
    # D block size is 1, so it rides the BlockSpec index_map.  All kernel
    # blocks are regular, so the pipeline double-buffers them with no
    # in-kernel slicing/relayouts.
    shifts = [
        xs[:, :d2 + 1, qy:qy + h2p, qx:qx + w2p, :]
        for qy in range(2) for qx in range(2)
    ]

    wmat = superpatch_weights(kernel.astype(jnp.bfloat16))   # (64Ci, 8Co)
    wmat = wmat.reshape(8, 8 * cin, 8 * cout)
    brow = jnp.tile(bias.astype(jnp.float32), 8).reshape(1, 8 * cout)

    kern = functools.partial(
        _fwd_kernel, th=th, w2=w2p, c8=c8, act=act, alpha=alpha,
        out_dtype=out_dtype)

    def xspec(qz):
        return pl.BlockSpec((1, 1, th, w2p, c8),
                            lambda b, d, t, qz=qz: (b, d + qz, t, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(b, d2, n_ht),
        in_specs=[xspec(qz) for qz in range(2) for _ in range(4)] + [
            pl.BlockSpec((8, 8 * cin, 8 * cout), lambda b, d, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * cout), lambda b, d, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, w2p, 8 * cout),
            lambda b, d, t: (b, d, t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d2, h2p, w2p, 8 * cout),
                                       out_dtype),
        interpret=interpret,
    )(*(shifts * 2), wmat, brow)

    out = out[:, :, :h2, :w2, :]
    y = depth_to_space2(out, (do, ho, wo))
    return y[..., :cout_real]


# ---------------------------------------------------------------------------
# Differentiable wrapper (opt-in integration point)
# ---------------------------------------------------------------------------

def _lax_reference(x, kernel, bias, act, alpha):
    # single-dtype conv so the transpose (gradient) rules stay well-typed
    dt = jnp.result_type(x.dtype, kernel.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1, 1),
        "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) \
        + bias.astype(dt)
    return _act(y, act, alpha)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3d_s2d(x, kernel, bias, act: str = "none", alpha: float = 0.01):
    """Differentiable fused conv3d: Pallas s2d kernel forward, XLA
    backward (the cotangents are derived from the lax reference — an
    extra forward recompute in the backward pass, correct by
    construction; a native s2d backward is the round-2 plan, NOTES.md).
    """
    return _conv3d_s2d_fwd(x, kernel, bias, act=act, alpha=alpha,
                           out_dtype=jnp.bfloat16)


def _conv3d_s2d_vjp_fwd(x, kernel, bias, act, alpha):
    return conv3d_s2d(x, kernel, bias, act, alpha), (x, kernel, bias)


def _conv3d_s2d_vjp_bwd(act, alpha, res, g):
    x, kernel, bias = res
    out_ref, vjp = jax.vjp(
        lambda x, k, b: _lax_reference(x, k, b, act, alpha),
        x, kernel, bias)
    return vjp(g.astype(out_ref.dtype))


conv3d_s2d.defvjp(_conv3d_s2d_vjp_fwd, _conv3d_s2d_vjp_bwd)

"""Resize / zoom / crop kernels.

TPU-native equivalents of the reference's resampling ops:
  * scipy ``ndi.zoom`` in-plane 0.5x/2x/12x (reference: common/data.py:354-381,
    tester/UnetSegmentationTester.py:29, test_sdm_resampling.py:19-50)
  * torch trilinear ``Upsample(scale_factor=2)`` (reference: Unet3D.py:44,46)
  * center-crop for skip connections (reference: Unet3D.py:6-11 ``crop``)

All are separable per-axis gathers + lerps, which XLA fuses; no host round
trips.  ``align_corners=True`` matches torch-0.3 trilinear upsampling and
scipy zoom's grid convention.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_matrix(n: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, n) 1-D linear-interp matrix.

    Per-axis resize is expressed as a small dense matmul instead of
    gathers: the MXU eats it, the gradient is just the transposed matmul,
    and XLA fuses the interleaved per-axis contractions — gathers/scatters
    were the dominant cost of the U-Net's trilinear upsamples on TPU.
    """
    if align_corners:
        coords = np.linspace(0.0, n - 1.0, out_size)
    else:
        coords = np.clip((np.arange(out_size) + 0.5) * (n / out_size) - 0.5,
                         0.0, n - 1.0)
    i0 = np.clip(np.floor(coords).astype(np.int64), 0, max(n - 2, 0))
    w = coords - i0
    m = np.zeros((out_size, n), np.float32)
    rows = np.arange(out_size)
    m[rows, i0] = 1.0 - w
    if n > 1:
        m[rows, i0 + 1] += w
    return m


@functools.lru_cache(maxsize=None)
def _nearest_matrix(n: int, out_size: int) -> np.ndarray:
    # scipy order-0 zoom convention: index = round(i * (n-1)/(out-1))
    if out_size == 1:
        idx = np.array([0], np.int64)
    else:
        idx = np.round(np.linspace(0.0, n - 1.0, out_size)).astype(np.int64)
    m = np.zeros((out_size, n), np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


def _apply_axis_matrix(x: jnp.ndarray, m: np.ndarray, axis: int) -> jnp.ndarray:
    w = jnp.asarray(m, x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                    else jnp.float32)
    xf = x if jnp.issubdtype(x.dtype, jnp.floating) else x.astype(w.dtype)
    # contract directly on the target axis (no moveaxis round trip — XLA's
    # transposes around the restored layout cost ~2x on TPU)
    ins = "".join(chr(ord("a") + i) for i in range(x.ndim))
    axl = ins[axis % x.ndim]
    outs = ins.replace(axl, "Z")
    out = jnp.einsum(f"{ins},Z{axl}->{outs}", xf, w,
                     preferred_element_type=w.dtype)
    return out.astype(x.dtype) if out.dtype != x.dtype else out


def _axis_linear(x: jnp.ndarray, axis: int, out_size: int,
                 align_corners: bool = True) -> jnp.ndarray:
    """1-D linear resample of one axis (separable building block)."""
    n = x.shape[axis]
    if out_size == n:
        return x
    if n == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    return _apply_axis_matrix(x, _linear_matrix(n, out_size, align_corners),
                              axis)


def _axis_nearest(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    n = x.shape[axis]
    if out_size == n:
        return x
    return _apply_axis_matrix(x, _nearest_matrix(n, out_size), axis)


def resize_linear(x: jnp.ndarray, out_sizes: Sequence[int],
                  axes: Sequence[int], align_corners: bool = True) -> jnp.ndarray:
    """Separable multilinear resize of the given axes to ``out_sizes``."""
    for ax, s in zip(axes, out_sizes):
        x = _axis_linear(x, ax, s, align_corners)
    return x


def resize_nearest(x: jnp.ndarray, out_sizes: Sequence[int],
                   axes: Sequence[int]) -> jnp.ndarray:
    for ax, s in zip(axes, out_sizes):
        x = _axis_nearest(x, ax, s)
    return x


def zoom_inplane(x: jnp.ndarray, factor: float, order: int = 1,
                 hw_axes: Tuple[int, int] = None) -> jnp.ndarray:
    """In-plane (H, W) zoom of a ``(..., D, H, W, C)`` volume.

    TPU equivalent of the per-slice ``ndi.zoom`` loop in the reference's
    ``ResamplePlaneXY`` transform (common/data.py:354-381) — one fused
    device op instead of Z*C host calls.  Output sizes follow scipy's
    ``round(size * factor)`` convention.
    """
    if hw_axes is None:
        hw_axes = (x.ndim - 3, x.ndim - 2)
    out = tuple(int(round(x.shape[a] * factor)) for a in hw_axes)
    if order == 0:
        return resize_nearest(x, out, hw_axes)
    return resize_linear(x, out, hw_axes, align_corners=True)


def upsample2x_trilinear(x: jnp.ndarray) -> jnp.ndarray:
    """x2 trilinear upsample of ``(B, D, H, W, C)``; torch-0.3
    ``Upsample(scale_factor=2, mode='trilinear')`` equivalent
    (reference: Unet3D.py:44,46)."""
    d, h, w = x.shape[-4:-1]
    return resize_linear(x, (2 * d, 2 * h, 2 * w),
                         (x.ndim - 4, x.ndim - 3, x.ndim - 2),
                         align_corners=True)


def center_crop(x: jnp.ndarray, target_spatial: Sequence[int]) -> jnp.ndarray:
    """Center-crop the spatial (D, H, W) axes of ``(B, D, H, W, C)`` to the
    target sizes (reference: Unet3D.py:6-11 ``crop``)."""
    slices = [slice(None)] * x.ndim
    for ax, t in zip((x.ndim - 4, x.ndim - 3, x.ndim - 2), target_spatial):
        start = (x.shape[ax] - t) // 2
        slices[ax] = slice(start, start + t)
    return x[tuple(slices)]

"""Signed-distance-map (SDM) shape-interpolation baseline, on device.

reference: test_sdm_resampling.py:15-52 (``sdm_interpolate_numpy``) — the
non-learned baseline: signed EDTs of the penumbra and core masks, optional
1/12 in-plane "latent" downsample, linear SDM interpolation by the
normalized time-to-treatment, zoom back, threshold at 0.  When the core
mask is empty, an artificial core is placed at the penumbra's center of
mass and dilated (test_sdm_resampling.py:26-30).

Everything runs as one fused XLA computation over the volume (EDT kernel
from ops/edt.py); the reference's scipy version is a host pipeline with 4
EDTs + multiple zoom round trips per case.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from stroke_prediction_tpu.ops.edt import distance_transform_edt
from stroke_prediction_tpu.ops.resize import resize_linear


def _binary_dilation_cross(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """6-connectivity binary dilation (scipy ``binary_dilation`` default
    structure), zero boundary."""
    m = mask
    for _ in range(iterations):
        p = jnp.pad(m, 1)
        m = (p[1:-1, 1:-1, 1:-1]
             | p[:-2, 1:-1, 1:-1] | p[2:, 1:-1, 1:-1]
             | p[1:-1, :-2, 1:-1] | p[1:-1, 2:, 1:-1]
             | p[1:-1, 1:-1, :-2] | p[1:-1, 1:-1, 2:])
    return m


def _artificial_core(penu_bin: jnp.ndarray, dilate: int) -> jnp.ndarray:
    """Dilated single voxel at the penumbra center of mass
    (reference: test_sdm_resampling.py:26-30)."""
    wsum = jnp.maximum(jnp.sum(penu_bin), 1)
    zz = jax.lax.broadcasted_iota(jnp.float32, penu_bin.shape, 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, penu_bin.shape, 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, penu_bin.shape, 2)
    pb = penu_bin.astype(jnp.float32)
    cz = (jnp.sum(zz * pb) / wsum).astype(jnp.int32)
    cy = (jnp.sum(yy * pb) / wsum).astype(jnp.int32)
    cx = (jnp.sum(xx * pb) / wsum).astype(jnp.int32)
    seed = jnp.zeros(penu_bin.shape, bool).at[cz, cy, cx].set(True)
    return _binary_dilation_cross(seed, dilate)


def _zoom_latent(vol: jnp.ndarray, factor: float) -> jnp.ndarray:
    """In-plane (H, W) zoom of a (D, H, W) volume, scipy size convention."""
    out_h = int(round(vol.shape[1] * factor))
    out_w = int(round(vol.shape[2] * factor))
    return resize_linear(vol[..., None], (out_h, out_w), (1, 2))[..., 0]


@partial(jax.jit, static_argnames=("threshold", "zoom", "dilate", "resample"))
def sdm_interpolate(core: jnp.ndarray, penu: jnp.ndarray,
                    interpolation: jnp.ndarray, threshold: float = 0.5,
                    zoom: int = 12, dilate: int = 3, resample: bool = True):
    """SDM interpolation of a single (D, H, W) case.

    Returns (recon_core, recon_intp, recon_penu, latent_core, latent_intp,
    latent_penu); recon SDMs threshold as ``recon_intp > 0`` (lesion),
    ``recon_core < 0`` (core), ``recon_penu > 0`` (penumbra) — matching
    the reference's sign conventions (penumbra SDM positive inside, core
    SDM positive outside)."""
    d, h, w = core.shape
    t = jnp.asarray(interpolation, jnp.float32)

    penu_bin = penu > threshold
    penu_sdm = (distance_transform_edt(penu_bin)
                - distance_transform_edt(penu < threshold))

    core_bin = core > threshold
    art = _artificial_core(penu_bin, dilate)
    core_bin = jnp.where(jnp.any(core_bin), core_bin, art)
    core_sdm = (distance_transform_edt(jnp.logical_not(core_bin))
                - distance_transform_edt(core > threshold))

    latent_penu = _zoom_latent(penu_sdm, 1.0 / zoom)
    latent_core = _zoom_latent(core_sdm, 1.0 / zoom)
    latent_intp = latent_penu * t - latent_core * (1.0 - t)

    if resample:
        def back(lat):
            """Upsample the latent back to (d, h, w): center-crop when the
            round-tripped plane overshoots (the reference's fixed
            ``[2:130]`` crop for 128-wide planes,
            test_sdm_resampling.py:41-50), edge-pad when it undershoots."""
            up = _zoom_latent(lat, float(zoom))
            for ax, target in ((1, h), (2, w)):
                cur = up.shape[ax]
                if cur > target:
                    off = (cur - target) // 2
                    up = jax.lax.slice_in_dim(up, off, off + target, axis=ax)
                elif cur < target:
                    pad = [(0, 0)] * 3
                    lo = (target - cur) // 2
                    pad[ax] = (lo, target - cur - lo)
                    up = jnp.pad(up, pad, mode="edge")
            return up

        recon_core = back(latent_core)
        recon_penu = back(latent_penu)
        recon_intp = back(latent_intp)
    else:
        recon_core = core_sdm
        recon_penu = penu_sdm
        recon_intp = penu_sdm * t - core_sdm * (1.0 - t)

    return (recon_core, recon_intp, recon_penu,
            latent_core, latent_intp, latent_penu)

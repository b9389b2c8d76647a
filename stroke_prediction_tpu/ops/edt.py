"""Euclidean distance transforms on device.

TPU-native equivalent of ``scipy.ndimage.distance_transform_edt`` as used by
the reference's SDM interpolation baseline (test_sdm_resampling.py:17-33)
and of medpy's surface-distance machinery behind HD/ASSD metrics
(common/metrics.py:35-44).

Algorithm: separable exact squared EDT.
  * axis 0: O(n) two-sided nearest-site scan via ``lax.cummax`` index
    propagation (binary input),
  * remaining axes: exact lower-envelope-of-parabolas step evaluated as a
    chunked vectorized min-plus reduction ``D(i) = min_j (f(j) + (i-j)^2)``
    — O(n^2) per line but branch-free and perfectly shaped for the VPU
    (n <= 168 here), instead of the sequential Felzenszwalb envelope scan
    that XLA cannot pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 1e12  # effectively-infinite squared distance


def _nearest_site_dist1d(sites: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Per-voxel distance (in voxels) along ``axis`` to the nearest True in
    ``sites`` (inf-like _BIG**0.5 if the line has none)."""
    n = sites.shape[axis]
    idx_shape = [1] * sites.ndim
    idx_shape[axis] = n
    idx = jnp.arange(n, dtype=jnp.float32).reshape(idx_shape)
    idx = jnp.broadcast_to(idx, sites.shape)

    # nearest site to the left: cummax propagates the largest site index <= i
    left_idx = lax.cummax(jnp.where(sites, idx, -_BIG), axis=axis)
    dist_left = idx - left_idx

    # nearest site to the right: propagate -(smallest site index >= i)
    right_neg = jnp.flip(lax.cummax(jnp.flip(jnp.where(sites, -idx, -_BIG),
                                             axis=axis), axis=axis), axis=axis)
    dist_right = (-right_neg) - idx

    return jnp.minimum(dist_left, dist_right)


def _parabola_pass_xla(f2: jnp.ndarray, axis: int,
                       chunk: int = 64) -> jnp.ndarray:
    """One separable squared-EDT pass: ``out(i) = min_j (f2(j) + (i-j)^2)``
    along ``axis``, computed line-chunk-wise to bound memory (the
    reference/CPU implementation; the TPU default is the Pallas
    line-resident kernel below)."""
    n = f2.shape[axis]
    moved = jnp.moveaxis(f2, axis, -1)
    lead_shape = moved.shape[:-1]
    lines = moved.reshape(-1, n)
    n_lines = lines.shape[0]

    i = jnp.arange(n, dtype=f2.dtype)
    d2 = (i[:, None] - i[None, :]) ** 2  # (n_out, n_in)

    pad = (-n_lines) % chunk
    if pad:
        lines = jnp.concatenate(
            [lines, jnp.zeros((pad, n), dtype=lines.dtype)], axis=0)
    chunks = lines.reshape(-1, chunk, n)

    def one(c):
        return jnp.min(c[:, None, :] + d2[None, :, :], axis=-1)

    out = lax.map(one, chunks).reshape(-1, n)
    if pad:
        out = out[:n_lines]
    return jnp.moveaxis(out.reshape(lead_shape + (n,)), -1, axis)


def _parabola_kernel(f_ref, o_ref, *, n: int):
    """Line-resident tropical (min, +) pass: the (L, n) line block stays
    in VMEM; for each source index j the candidate ``f[:, j] + (i-j)^2``
    is a lane-broadcast + constant-row add, so the O(n^2) work runs at
    VPU register bandwidth with no HBM round trips (the XLA chunked
    formulation materializes an (L, n, n) broadcast per chunk)."""
    f = f_ref[...]
    L, npad = f.shape
    # Mosaic iota is integer-only
    i = jax.lax.broadcasted_iota(jnp.int32, (L, npad), 1).astype(jnp.float32)
    out = None
    for j in range(n):                      # real columns only
        cand = jax.lax.broadcast_in_dim(f[:, j], (L, npad), (0,)) \
            + (i - float(j)) ** 2
        out = cand if out is None else jnp.minimum(out, cand)
    o_ref[...] = out


def _parabola_pass_pallas(f2: jnp.ndarray, axis: int,
                          block: int = 256) -> jnp.ndarray:
    from functools import partial as _partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = f2.shape[axis]
    moved = jnp.moveaxis(f2, axis, -1)
    lead_shape = moved.shape[:-1]
    lines = moved.reshape(-1, n)
    n_lines = lines.shape[0]
    pad_l = (-n_lines) % block
    if pad_l:
        lines = jnp.pad(lines, ((0, pad_l), (0, 0)))
    n_pad = (-n) % 128
    if n_pad:
        # padded lanes hold _BIG so they never win the min
        lines = jnp.pad(lines, ((0, 0), (0, n_pad)),
                        constant_values=_BIG)
    grid = lines.shape[0] // block

    out = pl.pallas_call(
        _partial(_parabola_kernel, n=n),
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, lines.shape[1]),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, lines.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(lines.shape, jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(lines.astype(jnp.float32))
    out = out[:n_lines, :n].astype(f2.dtype)
    return jnp.moveaxis(out.reshape(lead_shape + (n,)), -1, axis)


def _parabola_pass(f2: jnp.ndarray, axis: int) -> jnp.ndarray:
    if jax.default_backend() == "tpu":
        return _parabola_pass_pallas(f2, axis)
    return _parabola_pass_xla(f2, axis)


@partial(jax.jit, static_argnames=("axes",))
def _edt_from_sites(sites: jnp.ndarray, axes=(0, 1, 2)) -> jnp.ndarray:
    first, *rest = axes
    d = _nearest_site_dist1d(sites, first)
    f2 = jnp.minimum(d * d, _BIG)
    for ax in rest:
        f2 = _parabola_pass(f2, ax)
    return jnp.sqrt(f2)


def distance_transform_edt(x: jnp.ndarray) -> jnp.ndarray:
    """Distance from each non-zero voxel to the nearest zero voxel of a 3-D
    volume; zero elsewhere.  scipy ``distance_transform_edt`` semantics.

    Volumes with no zero voxel at all return _BIG**0.5-scale values (scipy
    would return all-zero in that degenerate case; callers here never hit
    it with clinical masks, and the SDM pipeline thresholds at 0).
    """
    sites = jnp.logical_not(jnp.asarray(x, bool))
    dist = _edt_from_sites(sites)
    return jnp.where(sites, 0.0, dist)


def edt_to_sites(sites: jnp.ndarray) -> jnp.ndarray:
    """Distance of every voxel to the nearest True voxel in ``sites``."""
    return _edt_from_sites(jnp.asarray(sites, bool))


def signed_edt(mask: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Signed distance map: positive inside ``mask > threshold``, negative
    outside — the SDM representation of the reference baseline
    (test_sdm_resampling.py:16-18: ``edt(penu > thr) - edt(penu < thr)``)."""
    inside = mask > threshold
    return distance_transform_edt(inside) - distance_transform_edt(
        jnp.logical_not(inside))

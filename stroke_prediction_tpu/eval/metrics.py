"""Losses and binary segmentation measures, fully in-graph.

TPU-native equivalents of the reference metrics layer (common/metrics.py):

  * :func:`batch_dice_loss` — the reference ``BatchDiceLoss``
    (metrics.py:8-28): per-label-channel soft Dice over the flattened
    batch, weighted.
  * :func:`binary_measures` — the medpy-backed measures
    (metrics.py:31-62): Dice, Hausdorff, ASSD, precision, sensitivity,
    specificity.  medpy computes HD/ASSD on the host from scipy EDT surface
    distances, forcing a device→host sync per batch (SURVEY.md §3.1); here
    surface distances are computed on device with the separable EDT kernel
    (ops/edt.py), so metric evaluation stays inside jit.

HD/ASSD are inf when either mask is empty (reference: metrics.py:36-44).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from stroke_prediction_tpu.core.dto import BinaryMeasures
from stroke_prediction_tpu.ops.edt import edt_to_sites


def batch_dice_loss(outputs: jnp.ndarray, targets: jnp.ndarray,
                    label_weights: Sequence[float] = (1.0,),
                    epsilon: float = 1e-7) -> jnp.ndarray:
    """Soft Dice loss over the flattened batch, per label channel
    (channel-last).  reference: common/metrics.py:8-28."""
    assert targets.shape[-1] == len(label_weights), \
        "Ground truth number of labels does not match label weight vector"
    o = outputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    inter = jnp.sum(o * t, axis=tuple(range(o.ndim - 1)))
    denom = (jnp.sum(o * o, axis=tuple(range(o.ndim - 1)))
             + jnp.sum(t * t, axis=tuple(range(o.ndim - 1))))
    dice = (2.0 * inter + epsilon) / (denom + epsilon)
    w = jnp.asarray(label_weights, jnp.float32)
    return 1.0 - jnp.sum(w * dice)


def monotonicity_hinge(diff: jnp.ndarray) -> jnp.ndarray:
    """``mean(|d| - d)`` — penalizes negative entries of ``d``; the
    reference's core⊆interp⊆penumbra ordering term
    (CaeReconstructionLearner.py:58-62)."""
    return jnp.mean(jnp.abs(diff) - diff)


def _surface6(mask: jnp.ndarray) -> jnp.ndarray:
    """Surface voxels under 6-connectivity erosion with zero border
    (scipy ``binary_erosion`` default, as used by medpy's
    ``__surface_distances``)."""
    m = mask
    padded = jnp.pad(m, 1, constant_values=False)
    c = padded[1:-1, 1:-1, 1:-1]
    eroded = (c
              & padded[:-2, 1:-1, 1:-1] & padded[2:, 1:-1, 1:-1]
              & padded[1:-1, :-2, 1:-1] & padded[1:-1, 2:, 1:-1]
              & padded[1:-1, 1:-1, :-2] & padded[1:-1, 1:-1, 2:])
    return m & ~eroded


@jax.jit
def _surface_distance_stats(a: jnp.ndarray, b: jnp.ndarray):
    """(max, sum, count) of distances from surface(a) to surface(b)."""
    sa = _surface6(a)
    sb = _surface6(b)
    dist_to_b = edt_to_sites(sb)
    d = jnp.where(sa, dist_to_b, 0.0)
    return jnp.max(d), jnp.sum(d), jnp.sum(sa)


@partial(jax.jit, static_argnames=("with_distances",))
def binary_measures(result: jnp.ndarray, target: jnp.ndarray,
                    binary_threshold: float = 0.5,
                    with_distances: bool = True) -> BinaryMeasures:
    """All binary measures for one structure; arrays of any matching shape
    (flattened internally except for the 3-D surface distances, which use
    the last three non-channel axes).  reference: common/metrics.py:31-62.
    """
    r = result > binary_threshold
    t = target > binary_threshold
    rf = r.reshape(-1).astype(jnp.float32)
    tf = t.reshape(-1).astype(jnp.float32)

    tp = jnp.sum(rf * tf)
    fp = jnp.sum(rf * (1 - tf))
    fn = jnp.sum((1 - rf) * tf)
    tn = jnp.sum((1 - rf) * (1 - tf))

    dc = jnp.where(2 * tp + fp + fn > 0, 2 * tp / (2 * tp + fp + fn), 0.0)
    precision = jnp.where(tp + fp > 0, tp / (tp + fp), 0.0)
    sensitivity = jnp.where(tp + fn > 0, tp / (tp + fn), 0.0)
    specificity = jnp.where(tn + fp > 0, tn / (tn + fp), 0.0)

    hd = jnp.asarray(jnp.inf, jnp.float32)
    assd = jnp.asarray(jnp.inf, jnp.float32)
    if with_distances:
        # normalize to (B, D, H, W): add batch dim and/or drop channel dim
        def to_b3(m):
            if m.ndim == 3:
                m = m[None]
            elif m.ndim == 4:          # (D, H, W, C) single sample
                m = jnp.moveaxis(m, -1, 0)
            elif m.ndim == 5:          # (B, D, H, W, C) -> (B*C, D, H, W)
                m = jnp.moveaxis(m, -1, 1).reshape((-1,) + m.shape[1:4])
            return m

        r3, t3 = to_b3(r), to_b3(t)
        m1, s1, n1 = jax.vmap(_surface_distance_stats)(r3, t3)
        m2, s2, n2 = jax.vmap(_surface_distance_stats)(t3, r3)
        nonempty = jnp.any(r) & jnp.any(t)
        hd = jnp.where(nonempty, jnp.maximum(jnp.max(m1), jnp.max(m2)),
                       jnp.inf)
        assd = jnp.where(
            nonempty,
            (jnp.sum(s1) + jnp.sum(s2))
            / jnp.maximum(jnp.sum(n1) + jnp.sum(n2), 1),
            jnp.inf)

    return BinaryMeasures(dc=dc, hd=hd, assd=assd, precision=precision,
                          sensitivity=sensitivity, specificity=specificity)


def binary_measures_host(result, target, binary_threshold: float = 0.5,
                         with_distances: bool = True) -> BinaryMeasures:
    """Convenience wrapper producing host floats (for printing/curves)."""
    m = binary_measures(jnp.asarray(result), jnp.asarray(target),
                        binary_threshold, with_distances)
    import numpy as np
    return BinaryMeasures(*(np.asarray(v).item() for v in
                            (m.dc, m.hd, m.assd, m.precision,
                             m.sensitivity, m.specificity)))

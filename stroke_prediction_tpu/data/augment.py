"""On-device stochastic augmentation.

The reference runs augmentation on the host per ``__getitem__``
(common/data.py:215-351: HemisphericFlip, RandomPatch, ElasticDeform) —
its dominant CPU cost (SURVEY.md §3.1).  Here every stochastic transform is
a jit-compiled device function over the whole batch, driven by
``jax.random`` keys split from ``--seed``: XLA fuses it into the training
step and augmentation is exactly reproducible.

Layouts: batch volumes ``(B, D, H, W, C)``; the hemispheric (X) axis is W.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stroke_prediction_tpu.ops.warp import elastic_fields, map_coordinates_linear


def random_hemispheric_flip(key: jax.Array, images: Optional[jnp.ndarray],
                            labels: Optional[jnp.ndarray]):
    """Per-sample X-axis flip with p=0.5 (reference: common/data.py:234-246
    ``HemisphericFlip``)."""
    some = images if images is not None else labels
    b = some.shape[0]
    do_flip = jax.random.bernoulli(key, 0.5, (b,))

    def maybe_flip(v):
        if v is None:
            return None
        flipped = jnp.flip(v, axis=-2)   # W axis
        cond = do_flip.reshape((b,) + (1,) * (v.ndim - 1))
        return jnp.where(cond, flipped, v)

    return maybe_flip(images), maybe_flip(labels)


def random_patch(key: jax.Array, images: jnp.ndarray,
                 labels: Optional[jnp.ndarray],
                 patch_whd: Tuple[int, int, int],
                 pad_xyz: Tuple[int, int, int]):
    """Per-sample random crop (reference: common/data.py:249-277
    ``RandomPatch``): images to (w, h, d), labels to
    (w-2px, h-2py, d-2pz) at the same offset — the valid-conv output
    region of the image patch.  patch/pad given in reference (x, y, z)
    order; volumes are (B, D, H, W, C)."""
    w, h, d = patch_whd
    px, py, pz = pad_xyz
    b = images.shape[0]
    sd, sh, sw = images.shape[1:4]
    kx, ky, kz = jax.random.split(key, 3)
    off_w = jax.random.randint(kx, (b,), 0, sw - w + 1)
    off_h = jax.random.randint(ky, (b,), 0, sh - h + 1)
    off_d = jax.random.randint(kz, (b,), 0, sd - d + 1)

    def crop_one(v, od, oh, ow, size_dhw):
        return jax.lax.dynamic_slice(
            v, (od, oh, ow, 0), tuple(size_dhw) + (v.shape[-1],))

    imgs = jax.vmap(partial(crop_one, size_dhw=(d, h, w)))(
        images, off_d, off_h, off_w)
    labs = None
    if labels is not None:
        labs = jax.vmap(partial(
            crop_one, size_dhw=(d - 2 * pz, h - 2 * py, w - 2 * px)))(
            labels, off_d, off_h, off_w)
    return imgs, labs


def elastic_deform_batch(key: jax.Array, labels: jnp.ndarray,
                         images: Optional[jnp.ndarray] = None,
                         alpha: float = 100.0, sigma: float = 4.0,
                         z_scale: float = 0.22,
                         apply_to_images: bool = False):
    """Per-sample elastic deformation sharing one displacement field across
    channels (reference: common/data.py:313-351)."""
    b = labels.shape[0]
    keys = jax.random.split(key, b)

    def one(k, lab, img):
        d, h, w = lab.shape[:3]
        disp = elastic_fields(k, (d, h, w), alpha, sigma, z_scale, lab.dtype)
        base = jnp.stack(
            jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w),
                         indexing="ij"), axis=0).astype(lab.dtype)
        coords = base + disp

        def warp(vol):
            return jax.vmap(lambda c: map_coordinates_linear(c, coords),
                            in_axes=-1, out_axes=-1)(vol)

        lab_out = warp(lab)
        img_out = warp(img) if (img is not None and apply_to_images) else img
        return lab_out, img_out

    if images is None:
        labs, _ = jax.vmap(lambda k, l: one(k, l, None))(keys, labels)
        return labs, None
    labs, imgs = jax.vmap(one)(keys, labels, images)
    return labs, imgs

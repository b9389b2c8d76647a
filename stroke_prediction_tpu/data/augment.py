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

    def one_hot_shift(off, n_out, n_in):
        """(B, n_out, n_in) exact f32 selection: row i picks in[i+off]."""
        io = jnp.arange(n_out, dtype=jnp.int32)
        ii = jnp.arange(n_in, dtype=jnp.int32)
        return (ii[None, None, :]
                == (off[:, None] + io[None, :])[..., None]).astype(
                    jnp.float32)

    def crop_batch(v, size_dhw):
        # per-sample crops as one-hot selection MATMULS per axis: the MXU
        # eats them at ~0.1 ms, where vmap(dynamic_slice) lowers to a
        # batched gather (~7 ms) and unrolled dynamic slices still pay
        # per-sample dynamic addressing (~5 ms).  HIGHEST precision keeps
        # the selection exact in f32 (the TPU default matmul precision
        # would round f32 inputs through bf16); one-hot matrices make the
        # extra passes negligible.
        td, th, tw = size_dhw
        hp = jax.lax.Precision.HIGHEST
        vf = v.astype(jnp.float32)
        if td != v.shape[1]:
            Pd = one_hot_shift(off_d, td, v.shape[1])
            vf = jnp.einsum("bDd,bdhwc->bDhwc", Pd, vf, precision=hp)
        Ph = one_hot_shift(off_h, th, v.shape[2])
        vf = jnp.einsum("bHh,bdhwc->bdHwc", Ph, vf, precision=hp)
        Pw = one_hot_shift(off_w, tw, v.shape[3])
        vf = jnp.einsum("bWw,bdhwc->bdhWc", Pw, vf, precision=hp)
        return vf.astype(v.dtype)

    imgs = crop_batch(images, (d, h, w))
    labs = None
    if labels is not None:
        labs = crop_batch(labels, (d - 2 * pz, h - 2 * py, w - 2 * px))
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

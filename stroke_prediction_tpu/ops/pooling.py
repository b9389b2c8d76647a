"""Pooling kernels (TPU equivalent of torch MaxPool3d, reference: Unet3D.py:40,42)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def max_pool3d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pool over the three spatial axes of a ``(..., D, H, W, C)`` array.

    VALID padding, matching ``nn.MaxPool3d(2, 2)`` (floor division of odd
    spatial dims).
    """
    ndim = x.ndim
    # pooled axes are the three before the trailing channel axis
    dims = [1] * ndim
    strides = [1] * ndim
    for ax in (ndim - 4, ndim - 3, ndim - 2):
        dims[ax] = window
        strides[ax] = stride
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -float("inf")   # concrete scalar: required for autodiff
    else:
        init = int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(x, init, lax.max, tuple(dims), tuple(strides),
                             "VALID")

"""3-D U-Net for core/penumbra segmentation.

TPU-native redesign of the reference model (common/model/Unet3D.py:30-84):
a 3-scale valid-convolution U-Net over (B, D, H, W, C) volumes — double
BN->Conv3x3x3(valid)->LeakyReLU(0.01) blocks, MaxPool(2) downsampling,
trilinear x2 upsampling, center-crop skip concatenation, and a
1x1x1-conv classifier head with sigmoid producing 2 channels (core,
penumbra).  Channel spec list [in, b1, b2, b3, b4, b5, bC, out] matches the
reference CLI ``--channels`` contract.

Valid-conv shape algebra (the reference's implicit contract, e.g. patch
104x104x68 -> labels 64x64x28) is encoded in :func:`unet_output_spatial`
with golden tests in tests/test_models.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from stroke_prediction_tpu.models.layers import (
    BnConvActBlock, Conv3d, conv_impl, leaky_relu)
from stroke_prediction_tpu.ops import (
    center_crop, max_pool3d, upsample2x_trilinear)
from stroke_prediction_tpu.ops.pallas.s2d import (
    s2d_center_crop, s2d_center_crop_cells, s2d_concat_channels, s2d_pack,
    s2d_poolpack, s2d_unpack, upsample2x_to_s2d)


def _s2d_up_concat(r_low, r_skip, compute_dtype):
    """Decoder-stage entry in the s2d domain: upsample the low-res
    feature map directly into cells and lane-concat the in-cell cropped
    skip — the full-resolution tensor is never re-laid-out.  Falls back
    to the logical concat + pack when the crop offsets are odd (possible
    for non-reference input geometries)."""
    u = upsample2x_to_s2d(s2d_unpack(r_low).astype(compute_dtype))
    skip = s2d_center_crop_cells(r_skip, u.logical[:3])
    if skip is not None:
        return s2d_concat_channels(u, skip)
    ul = s2d_unpack(u)
    return s2d_pack(jnp.concatenate(
        [ul, s2d_center_crop(r_skip, ul.shape[1:4])], axis=-1))


def unet_output_spatial(spatial: Sequence[int],
                        n_scales: int = 3) -> Tuple[int, ...]:
    """Output (D, H, W) of the valid-conv U-Net for a given input shape.

    Per scale down: two valid 3x3x3 convs (-4) then pool (//2); bottom block
    -4; per scale up: x2 upsample then two valid convs (-4).
    """
    sizes = list(spatial)

    def down(s):
        return (s - 4) // 2

    def up(s):
        return 2 * s - 4

    for s in range(n_scales - 1):
        sizes = [down(v) for v in sizes]
    sizes = [v - 4 for v in sizes]
    for s in range(n_scales - 1):
        sizes = [up(v) for v in sizes]
    return tuple(sizes)


class UnetBlock(nn.Module):
    """Double BN->Conv(3,valid)->LeakyReLU block (reference: Unet3D.py:14-27).

    ``entry=True`` marks the NETWORK's first block: its first conv's
    input is raw data (BN folded into the kernel for VALID convs), so
    the s2d backward skips the never-needed dx half."""

    features: int
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32
    entry: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(act="leaky_relu", act_param=0.01, axis_name=self.axis_name,
                  compute_dtype=self.compute_dtype)
        x = BnConvActBlock(self.features, input_grad=not self.entry,
                           **kw)(x, train)
        x = BnConvActBlock(self.features, **kw)(x, train)
        return x


class Unet3D(nn.Module):
    """reference: common/model/Unet3D.py:30-84."""

    channels: Tuple[int, ...] = (2, 32, 64, 128, 64, 32, 32, 2)
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, D, H, W, n_in) -> segmentation (B, D', H', W', n_classes)
        in [0, 1] (sigmoid)."""
        _, b1, b2, b3, b4, b5, b_c, n_classes = self.channels
        kw = dict(axis_name=self.axis_name, compute_dtype=self.compute_dtype)

        if conv_impl() == "pallas_s2d":
            # chained s2d-domain path: each scale enters the cell layout
            # once, its two fused BN+conv+act kernels chain with no
            # re-layout, pooling is a free channel-group max, and the skip
            # crops exit through the covering cells only
            cd = self.compute_dtype
            r1 = UnetBlock(b1, entry=True, **kw)(s2d_pack(x.astype(cd)),
                                                 train)
            r2 = UnetBlock(b2, **kw)(s2d_poolpack(r1), train)
            r3 = UnetBlock(b3, **kw)(s2d_poolpack(r2), train)

            r4 = UnetBlock(b4, **kw)(_s2d_up_concat(r3, r2, cd), train)
            r5 = UnetBlock(b5, **kw)(_s2d_up_concat(r4, r1, cd), train)
            # the 1x1 head stays in-domain (128-lane matmuls + fused
            # activation); only the n_classes-channel output unpacks
            h = Conv3d(b_c, (1, 1, 1), compute_dtype=self.compute_dtype)(
                r5, act="leaky_relu", act_param=0.01)
            h = Conv3d(n_classes, (1, 1, 1),
                       compute_dtype=self.compute_dtype)(h)
            return nn.sigmoid(s2d_unpack(h).astype(jnp.float32))
        else:
            r1 = UnetBlock(b1, **kw)(x, train)
            r2 = UnetBlock(b2, **kw)(max_pool3d(r1), train)
            r3 = UnetBlock(b3, **kw)(max_pool3d(r2), train)

            u3 = upsample2x_trilinear(r3)
            r4 = UnetBlock(b4, **kw)(
                jnp.concatenate([u3, center_crop(r2, u3.shape[1:4])],
                                axis=-1), train)
            u4 = upsample2x_trilinear(r4)
            r5 = UnetBlock(b5, **kw)(
                jnp.concatenate([u4, center_crop(r1, u4.shape[1:4])],
                                axis=-1), train)

        h = Conv3d(b_c, (1, 1, 1), compute_dtype=self.compute_dtype)(r5)
        h = leaky_relu(h, 0.01)
        h = Conv3d(n_classes, (1, 1, 1), compute_dtype=self.compute_dtype)(h)
        return nn.sigmoid(h.astype(jnp.float32))


class LargeUnet3D(nn.Module):
    """4-scale variant (reference: Unet3D.py:87-148 — which is dead code
    with a broken ``super()`` call; this is the intended working version).
    Channel spec: [in, b1..b7, bC, out]."""

    channels: Tuple[int, ...] = (2, 32, 64, 128, 256, 128, 64, 32, 32, 2)
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, b1, b2, b3, b4, b5, b6, b7, b_c, n_classes = self.channels
        kw = dict(axis_name=self.axis_name, compute_dtype=self.compute_dtype)

        if conv_impl() == "pallas_s2d":
            cd = self.compute_dtype
            r1 = UnetBlock(b1, entry=True, **kw)(s2d_pack(x.astype(cd)),
                                                 train)
            r2 = UnetBlock(b2, **kw)(s2d_poolpack(r1), train)
            r3 = UnetBlock(b3, **kw)(s2d_poolpack(r2), train)
            r4 = UnetBlock(b4, **kw)(s2d_poolpack(r3), train)

            r5 = UnetBlock(b5, **kw)(_s2d_up_concat(r4, r3, cd), train)
            r6 = UnetBlock(b6, **kw)(_s2d_up_concat(r5, r2, cd), train)
            r7 = UnetBlock(b7, **kw)(_s2d_up_concat(r6, r1, cd), train)
            # in-domain 1x1 head (see Unet3D)
            h = Conv3d(b_c, (1, 1, 1), compute_dtype=self.compute_dtype)(
                r7, act="leaky_relu", act_param=0.01)
            h = Conv3d(n_classes, (1, 1, 1),
                       compute_dtype=self.compute_dtype)(h)
            return nn.sigmoid(s2d_unpack(h).astype(jnp.float32))
        else:
            r1 = UnetBlock(b1, **kw)(x, train)
            r2 = UnetBlock(b2, **kw)(max_pool3d(r1), train)
            r3 = UnetBlock(b3, **kw)(max_pool3d(r2), train)
            r4 = UnetBlock(b4, **kw)(max_pool3d(r3), train)

            u = upsample2x_trilinear(r4)
            r5 = UnetBlock(b5, **kw)(
                jnp.concatenate([u, center_crop(r3, u.shape[1:4])], axis=-1),
                train)
            u = upsample2x_trilinear(r5)
            r6 = UnetBlock(b6, **kw)(
                jnp.concatenate([u, center_crop(r2, u.shape[1:4])], axis=-1),
                train)
            u = upsample2x_trilinear(r6)
            r7 = UnetBlock(b7, **kw)(
                jnp.concatenate([u, center_crop(r1, u.shape[1:4])], axis=-1),
                train)

        h = Conv3d(b_c, (1, 1, 1), compute_dtype=self.compute_dtype)(r7)
        h = leaky_relu(h, 0.01)
        h = Conv3d(n_classes, (1, 1, 1), compute_dtype=self.compute_dtype)(h)
        return nn.sigmoid(h.astype(jnp.float32))

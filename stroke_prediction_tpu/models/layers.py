"""Shared model layers: conv blocks with torch-0.3-compatible initialization.

Compute-dtype policy: parameters live in float32; convolutions can run in
bfloat16 (``compute_dtype``) so the MXU is fed its native dtype, with
normalization statistics kept in float32.  This is the standard TPU mixed
precision recipe and preserves Dice parity.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch-0.3 default Conv3d init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
    fan_in = in_ch * prod(kernel).  flax kernel shape: (*kernel, in, out)."""
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init_for(kernel_shape: Sequence[int]) -> Callable:
    fan_in = 1
    for s in kernel_shape[:-1]:
        fan_in *= s
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv3d_as_2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """VALID kD x kH x kW conv as kD accumulated 2-D convs over D-slabs
    (batch-merged).  ~2x faster than XLA's native 3-D conv lowering on TPU
    v5e for this model family — forward, dx, and dW alike
    (tools/perf_probe.py)."""
    kd = kernel.shape[0]
    b, d = x.shape[0], x.shape[1]
    dv = d - kd + 1
    out = None
    for t in range(kd):
        xs = lax.slice_in_dim(x, t, t + dv, axis=1)
        xs2 = xs.reshape((b * dv,) + x.shape[2:])
        y = lax.conv_general_dilated(
            xs2, kernel[t], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return out.reshape((b, dv) + out.shape[1:])


class Conv3d(nn.Module):
    """3-D convolution over (B, D, H, W, C) with torch-style init.

    ``padding`` is either 'VALID' or a (pd, ph, pw) symmetric-pad tuple
    matching torch's Conv3d padding semantics.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "VALID"
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init, kshape)
        bias = self.param("bias", torch_conv_bias_init_for(kshape),
                          (self.features,))

        cd = self.compute_dtype
        x = x.astype(cd)
        k = kernel.astype(cd)
        if isinstance(self.padding, (tuple, list)):
            pads = [(0, 0)] + [(int(p), int(p)) for p in self.padding] \
                + [(0, 0)]
            if any(p != (0, 0) for p in pads):
                x = jnp.pad(x, pads)

        if tuple(self.kernel_size) == (1, 1, 1):
            y = jnp.einsum("bdhwc,co->bdhwo", x, k[0, 0, 0])
        elif (tuple(self.kernel_size) == (3, 3, 3)
              and os.environ.get("STROKE_TPU_CONV_IMPL") == "pallas_s2d"):
            # opt-in: Pallas fused s2d forward (XLA-derived backward); the
            # batch-merged 2D path below is the tuned default
            from stroke_prediction_tpu.ops.pallas.conv3d import conv3d_s2d
            y = conv3d_s2d(x, k, jnp.zeros((self.features,), jnp.float32))
            return (y + bias.astype(y.dtype)
                    if tuple(self.strides) == (1, 1, 1) else
                    y[tuple([slice(None)]
                            + [slice(None, None, s) for s in self.strides]
                            + [slice(None)])] + bias.astype(y.dtype))
        else:
            y = _conv3d_as_2d(x, k)

        # Strided convs are lowered as stride-1 conv + subsample slice:
        # mathematically identical, and it avoids the input-dilated conv
        # gradient path that crashes the axon remote XLA compiler
        # (hlo_instruction.cc reshape-to-zero check) for the CAE encoder's
        # stride-2 layers.
        strides = tuple(self.strides)
        if strides != (1, 1, 1):
            sl = [slice(None)] + [slice(None, None, s) for s in strides] \
                + [slice(None)]
            y = y[tuple(sl)]
        return y + bias.astype(cd)


class ConvTranspose3d(nn.Module):
    """3-D transposed convolution, torch ``ConvTranspose3d(k, stride,
    padding=0)`` shape semantics: out = (in-1)*stride + k."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch fan_in for ConvTranspose is out-side? torch uses
        # weight shape (in, out, *k) and stdv from in_ch*prod(k).
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        conv = nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="VALID",
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init_for(kshape),
        )
        return conv(x)


class BatchNorm(nn.Module):
    """BatchNorm3d equivalent: normalizes over (B, D, H, W) per channel.

    torch defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9).  Under a
    batch-sharded ``jit`` the batch statistics are global automatically (XLA
    inserts the cross-replica reductions); ``axis_name`` is exposed for
    explicit ``shard_map`` use.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)


def leaky_relu(x, negative_slope=0.01):
    return nn.leaky_relu(x, negative_slope=negative_slope)


def elu(x, alpha=1.0):
    return nn.elu(x, alpha=alpha)


class BnConvActBlock(nn.Module):
    """BN -> Conv3d -> activation, the reference's basic unit
    (Unet3D.py:17-24 Block3x3x3 halves; Cae3D.py:39-76 encoder pairs)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "VALID"
    act: str = "leaky_relu"          # 'leaky_relu' | 'elu'
    act_param: float = 0.01
    axis_name: Optional[str] = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = BatchNorm(axis_name=self.axis_name,
                      compute_dtype=self.compute_dtype)(
            x, use_running_average=not train)
        x = Conv3d(self.features, self.kernel_size, self.strides,
                   self.padding, compute_dtype=self.compute_dtype)(x)
        if self.act == "leaky_relu":
            x = leaky_relu(x, self.act_param)
        elif self.act == "elu":
            x = elu(x, self.act_param)
        return x

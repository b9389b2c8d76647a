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

from stroke_prediction_tpu.ops.pallas.s2d import (
    S2d, ct_stride2_to_s2d, fold_bn, fold_bn_zsame, s2d_affine,
    s2d_batch_stats, s2d_cell_pad, s2d_conv, s2d_conv1x1, s2d_conv_stride2)

Dtype = Any


def conv_impl() -> str:
    """Active conv implementation: 'pallas_s2d' (chained s2d-domain Pallas
    kernels — the TPU default) or 'lax2d' (batch-merged 2-D lax convs —
    the CPU/fallback default).  Override with STROKE_TPU_CONV_IMPL."""
    v = os.environ.get("STROKE_TPU_CONV_IMPL", "auto")
    if v == "auto":
        return "pallas_s2d" if jax.default_backend() == "tpu" else "lax2d"
    return v


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
    # entry conv on DATA input: skip the dx half of the s2d backward
    input_grad: bool = True

    def _s2d_call(self, s: S2d, kernel, bias, scale, shift, act, act_param):
        """Fused path on an s2d-domain tensor: fold the (optional) BN
        affine into (kernel, bias), express the padding as conv modes
        (odd z pad -> mode 's'; even H/W pads -> exact cell pads), one
        Pallas kernel for conv+bias+activation.  1^3 convs are in-domain
        lane matmuls; stride-2 convs are cell-window einsums returning
        the logical half-resolution tensor (the BN affine is applied
        masked, since zero-padded boundaries make it unfoldable)."""
        act = act or "none"
        grouped = scale is not None and scale.ndim == 2
        if tuple(self.kernel_size) == (1, 1, 1):
            assert tuple(self.strides) == (1, 1, 1), self.strides
            if scale is not None:
                if grouped:
                    # per-group affine cannot fold into the shared kernel
                    s = s2d_affine(s, scale, shift)
                else:
                    kernel, bias = fold_bn(kernel, bias, scale, shift)
            return s2d_conv1x1(s, kernel[0, 0, 0], bias, act, act_param)
        assert tuple(self.kernel_size) == (3, 3, 3), self.kernel_size
        pads = ((0, 0, 0) if self.padding == "VALID"
                else tuple(int(p) for p in self.padding))
        if tuple(self.strides) == (2, 2, 2):
            assert pads in ((0, 0, 0), (1, 1, 1)), self.padding
            if scale is not None:
                s = s2d_affine(s, scale, shift)
            return s2d_conv_stride2(s, kernel, bias, act, act_param,
                                    pad=pads[0])
        assert tuple(self.strides) == (1, 1, 1), self.strides
        assert pads[0] in (0, 1) and pads[1] % 2 == 0 and pads[2] % 2 == 0, \
            self.padding
        if scale is not None:
            if grouped or pads[1] or pads[2]:
                # grouped affines cannot fold into the group-shared
                # kernel, and H/W cell-pads would need a full 3-D bias
                # table — apply the affine masked on the input instead
                s = s2d_affine(s, scale, shift)
            elif pads == (0, 0, 0):
                kernel, bias = fold_bn(kernel, bias, scale, shift)
            else:
                # z-SAME conv: plain folding is inexact (the conv pads
                # the BN OUTPUT with zeros, so the folded bias would
                # wrongly fire at boundary taps) — fold with a per-plane
                # bias table that zeroes the pad-tap shift at the two
                # boundary planes.  Exact, kills the separate affine
                # pass, and keeps BN grads alive under input_grad=False.
                kernel, bias = fold_bn_zsame(kernel, bias, scale, shift,
                                             s.logical[0])
        if pads[1] or pads[2]:
            s = s2d_cell_pad(s, (0, pads[1], pads[2]))
        modes = ("s" if pads[0] else "v", "v", "v")
        return s2d_conv(s, kernel, bias, act=act,
                        alpha=act_param, modes=modes,
                        input_grad=self.input_grad)

    @nn.compact
    def __call__(self, x, scale=None, shift=None, act: Optional[str] = None,
                 act_param: float = 0.01):
        in_ch = x.logical[3] if isinstance(x, S2d) else x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init, kshape)
        bias = self.param("bias", torch_conv_bias_init_for(kshape),
                          (self.features,))
        if isinstance(x, S2d):
            return self._s2d_call(x, kernel, bias, scale, shift, act,
                                  act_param)
        assert scale is None and act is None, \
            "BN folding / fused activation require the s2d domain"

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


class _ConvParams(nn.Module):
    """Kernel/bias holder matching flax nn.ConvTranspose's param tree."""

    kshape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_conv_kernel_init, self.kshape)
        bias = self.param("bias", torch_conv_bias_init_for(self.kshape),
                          (self.kshape[-1],))
        return kernel, bias


class ConvTranspose3d(nn.Module):
    """3-D transposed convolution, torch ``ConvTranspose3d(k, stride,
    padding=0)`` shape semantics: out = (in-1)*stride + k.

    Logical path: ``lax.conv_transpose`` (what flax nn.ConvTranspose
    lowers to for VALID padding).  With ``to_s2d=True`` and stride 2
    (k in {2, 3}), emits the output directly INTO the s2d cell layout
    via dense cell-window einsums (ops/pallas/s2d.py ct_stride2_to_s2d)
    with the activation fused — no re-layout of the upsampled tensor.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, to_s2d: bool = False, act: Optional[str] = None,
                 act_param: float = 1.0):
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        kernel, bias = _ConvParams(kshape, name="ConvTranspose_0")()
        cd = self.compute_dtype
        if to_s2d:
            assert tuple(self.strides) == (2, 2, 2), self.strides
            return ct_stride2_to_s2d(x.astype(cd), kernel, bias,
                                     act=act or "none", alpha=act_param)
        assert act is None
        y = lax.conv_transpose(
            x.astype(cd), kernel.astype(cd), self.strides, "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + bias.astype(cd)


class _BNCore(nn.Module):
    """BN parameters + running stats with flax nn.BatchNorm's exact tree
    layout ({scale, bias} params, {mean, var} batch_stats).  Returns the
    per-channel affine (s, t) such that bn(x) = x*s + t — the foldable
    form (ops/pallas/s2d.py fold_bn)."""

    features: int
    momentum: float
    epsilon: float

    @nn.compact
    def __call__(self, stats, use_running_average: bool):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = stats
            if not self.is_initializing():
                m = self.momentum
                if mean.ndim == 2:
                    # grouped stats (G, C): one running update PER group,
                    # in stacking order, exactly as the reference's G
                    # sequential module calls would chain them
                    g = mean.shape[0]
                    w = (1 - m) * m ** jnp.arange(g - 1, -1, -1,
                                                  dtype=jnp.float32)
                    ra_mean.value = (m ** g * ra_mean.value
                                     + jnp.tensordot(w, mean, 1))
                    ra_var.value = (m ** g * ra_var.value
                                    + jnp.tensordot(w, var, 1))
                else:
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = m * ra_var.value + (1 - m) * var
        s = scale * lax.rsqrt(var + self.epsilon)
        return s, bias - mean * s


class BatchNorm(nn.Module):
    """BatchNorm3d equivalent: normalizes over (B, D, H, W) per channel.

    torch defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9).  Under a
    batch-sharded ``jit`` the batch statistics are global automatically (XLA
    inserts the cross-replica reductions); ``axis_name`` is exposed for
    explicit ``shard_map`` use.

    Accepts a logical (B, D, H, W, C) array (returns the normalized array)
    or an :class:`S2d` tensor with ``fold=True`` (returns the (s, t) affine
    for BN folding into the following conv — masked statistics over the
    logical extent are exact thanks to the s2d zero invariant).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None,
                 fold: bool = False, groups: int = 1):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        is_s2d = isinstance(x, S2d)
        features = x.logical[3] if is_s2d else x.shape[-1]

        stats = None
        if not ura or self.is_initializing():
            if is_s2d:
                mean, var = s2d_batch_stats(x, groups=groups)
                ex2 = var + mean * mean
            else:
                xf = x.astype(jnp.float32)
                if groups > 1:
                    b = x.shape[0]
                    assert b % groups == 0, (b, groups)
                    xg = xf.reshape((groups, b // groups) + x.shape[1:])
                    axes = tuple(range(1, xg.ndim - 1))
                    mean = jnp.mean(xg, axes)          # (G, C)
                    ex2 = jnp.mean(xg * xg, axes)
                else:
                    axes = tuple(range(x.ndim - 1))
                    mean = jnp.mean(xf, axes)
                    ex2 = jnp.mean(xf * xf, axes)
            if self.axis_name is not None:
                # combine GLOBAL moments (pmean of E[x] and E[x^2]) —
                # pmean of per-shard variances would drop the
                # between-shard mean-variance term
                mean = lax.pmean(mean, self.axis_name)
                ex2 = lax.pmean(ex2, self.axis_name)
            var = jnp.maximum(ex2 - mean * mean, 0.0)
            stats = (mean, var)

        s, t = _BNCore(features, self.momentum, self.epsilon,
                       name="BatchNorm_0")(stats, ura)
        if fold:
            return s, t
        cd = self.compute_dtype
        if not is_s2d and s.ndim == 2:
            # grouped affine on a logical tensor: per-group broadcast
            b = x.shape[0]
            sg = jnp.repeat(s, b // groups, axis=0).astype(cd)
            tg = jnp.repeat(t, b // groups, axis=0).astype(cd)
            shape = (b,) + (1,) * (x.ndim - 2) + (features,)
            return (x.astype(cd) * sg.reshape(shape) + tg.reshape(shape))
        return x.astype(cd) * s.astype(cd) + t.astype(cd)


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
    input_grad: bool = True          # False for entry convs on data

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        bn = BatchNorm(axis_name=self.axis_name,
                       compute_dtype=self.compute_dtype)
        if isinstance(x, S2d):
            # fused s2d path: BN folded into the conv, activation in-kernel
            s, t = bn(x, use_running_average=not train, fold=True,
                      groups=groups)
            return Conv3d(self.features, self.kernel_size, self.strides,
                          self.padding, compute_dtype=self.compute_dtype,
                          input_grad=self.input_grad)(
                x, scale=s, shift=t, act=self.act, act_param=self.act_param)
        x = bn(x, use_running_average=not train, groups=groups)
        x = Conv3d(self.features, self.kernel_size, self.strides,
                   self.padding, compute_dtype=self.compute_dtype)(x)
        if self.act == "leaky_relu":
            x = leaky_relu(x, self.act_param)
        elif self.act == "elu":
            x = elu(x, self.act_param)
        return x

"""3-D convolutional autoencoder (CAE) shape-space models.

TPU-native redesign of the reference CAE family (common/model/Cae3D.py):

  * :class:`Enc3D` — 10-conv encoder with z-only padding and 3 stride-2
    downsamples, mapping (B, 28, 128, 128, 1) masks to a
    (B, 1, 10, 10, n_ch_fc) latent, plus latent linear interpolation
    ``core + t * (penu - core)`` (Cae3D.py:78-89).
  * :class:`Enc3DStep` — adds a clinical-scalar head regressing the
    interpolation step when no time-to-treatment is given
    (Cae3D.py:121-142; the N(0,1e-3)/N(0.5,1e-2) head init the reference
    marks "crucial" is preserved).
  * :class:`Enc3DCtp` — encoder over segmentation ⊕ cropped CBV ⊕ TTD
    (Cae3D.py:145-169).
  * :class:`Dec3D` — 14-layer mirrored decoder (Cae3D.py:172-239).
  * :class:`Cae3D` / :class:`Cae3DCtp` — enc∘dec composition.

The reference's runtime flag dance (FLAG_GTRUTH/FLAG_INPUTS/None checks,
Cae3D.py:100-118) becomes *static* branch configuration
(:class:`~stroke_prediction_tpu.core.dto.CaeBranches`), so each training
configuration traces to one fixed XLA graph.  Channel spec
[in, origin, down2x, down4x, down8x, fc, ..., classes] matches the
``--channelscae`` CLI contract.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from stroke_prediction_tpu.core.dto import (
    BRANCH_GTRUTH, CaeBranches, CaeDto)
from stroke_prediction_tpu.models.layers import (
    BnConvActBlock, BatchNorm, Conv3d, ConvTranspose3d, conv_impl, elu)
from stroke_prediction_tpu.ops.pallas.s2d import s2d_pack, s2d_unpack


def structure_batching() -> bool:
    """Whether the CAE encodes/decodes its structures (core/penu/lesion/
    interpolation) as ONE group-stacked batched pass instead of
    sequential per-structure passes.  Identical math (per-group BN,
    regression-tested bit-exact) — but measured SLOWER on the s2d Pallas
    engine (tools/cae_probe.py: the conv grids already serialize over
    (batch, depth), so a 3x batch just runs a 3x-longer grid, while the
    grouped BN affines can no longer fold into the shared kernels).
    Opt in with STROKE_TPU_CAE_BATCH=1."""
    return os.environ.get("STROKE_TPU_CAE_BATCH", "0") == "1"


def cae_latent_spatial(spatial: Tuple[int, int, int]) -> Tuple[int, int, int]:
    """Latent (D, H, W) for an input (D, H, W): the encoder's valid/strided
    shape algebra (e.g. 28x128x128 -> 1x10x10)."""
    dz, hy, wx = spatial
    for _ in range(2):   # two scales with z-padded 3^3 convs + stride-2 pad-1
        dz = dz                            # z padded
        hy, wx = hy - 4, wx - 4            # two valid-in-plane convs
        dz = (dz - 1) // 2 + 1
        hy = (hy - 1) // 2 + 1
        wx = (wx - 1) // 2 + 1
    dz, hy, wx = dz, hy - 4, wx - 4        # third double-conv block
    dz = (dz - 3) // 2 + 1                 # stride-2 valid
    hy = (hy - 3) // 2 + 1
    wx = (wx - 3) // 2 + 1
    return dz - 2, hy - 2, wx - 2          # final 3^3 valid conv


class EncoderStack(nn.Module):
    """The conv trunk of Enc3D (reference: Cae3D.py:39-76)."""

    channels: Tuple[int, ...]
    alpha: float = 1.0
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        _, origin, d2, d4, d8, fc = self.channels[:6]
        kw = dict(act="elu", act_param=self.alpha, axis_name=self.axis_name,
                  compute_dtype=self.compute_dtype)
        zpad = (1, 0, 0)      # z-only padding: (pad_d, pad_h, pad_w)
        s2d = conv_impl() == "pallas_s2d"
        if s2d:
            # chained s2d path: each between-strides pair runs as fused
            # z-SAME Pallas convs; the stride-2 convs are cell-window
            # einsums that exit to the (half-res) logical layout, which
            # re-enters the cell layout for the next pair.  The final
            # d8->fc layer stays logical (its channel count feeds the
            # MXU fine and its superpatch weights would not fit VMEM).
            x = s2d_pack(x.astype(self.compute_dtype))

        g = groups
        # The entry conv's input is DATA in every configuration (gtruth
        # masks, phase-2 U-Net-output volumes, CTP concats) — skip the dx
        # half of its backward.  Legal even though this conv is z-padded:
        # the BN affine is folded into (kernel', per-plane bias table)
        # via fold_bn_zsame, so the entry BatchNorm's scale/bias grads
        # flow through dW/dB, not dx (round-3 advisor finding; the
        # reference trains BatchNorm3d(n_input), Cae3D.py:44).
        x = BnConvActBlock(origin, padding=zpad, input_grad=False,
                           **kw)(x, train, g)
        x = BnConvActBlock(origin, padding=zpad, **kw)(x, train, g)
        x = BnConvActBlock(d2, strides=(2, 2, 2), padding=(1, 1, 1), **kw)(x, train, g)
        if s2d:
            x = s2d_pack(x)
        x = BnConvActBlock(d2, padding=zpad, **kw)(x, train, g)
        x = BnConvActBlock(d2, padding=zpad, **kw)(x, train, g)
        x = BnConvActBlock(d4, strides=(2, 2, 2), padding=(1, 1, 1), **kw)(x, train, g)
        if s2d:
            x = s2d_pack(x)
        x = BnConvActBlock(d4, padding=zpad, **kw)(x, train, g)
        x = BnConvActBlock(d4, padding=zpad, **kw)(x, train, g)
        x = BnConvActBlock(d8, strides=(2, 2, 2), padding="VALID", **kw)(x, train, g)
        x = BnConvActBlock(fc, padding="VALID", **kw)(x, train, g)
        return x


def interpolate_latent(latent_core, latent_penu, step):
    """``core + step * (penu - core)`` per batch sample
    (reference: Cae3D.py:78-89).  ``step``: (B, 1) or broadcastable."""
    if latent_core is None or latent_penu is None:
        return None
    assert step is not None, "Step must be given for interpolation!"
    s = step.reshape(step.shape[0], 1, 1, 1, 1).astype(latent_core.dtype)
    return latent_core + s * (latent_penu - latent_core)


class Enc3D(nn.Module):
    """reference: Cae3D.py:35-118."""

    channels: Tuple[int, ...]
    n_ch_global: int = 5
    alpha: float = 1.0
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = EncoderStack(self.channels, self.alpha,
                                    self.axis_name, self.compute_dtype)

    def _encode(self, x, train):
        if x is None:
            return None
        return self.encoder(x, train)

    def _encode_many(self, xs, train):
        """Encode several same-shaped structures in ONE batched trunk pass
        (group-stacked batch axis, per-structure BN statistics) — the
        reference runs the encoder once per structure sequentially
        (Cae3D.py:100-118); batching keeps its semantics (grouped BN
        stats, chained running updates) while tripling the matmul batch."""
        present = [(i, x) for i, x in enumerate(xs) if x is not None]
        if not present:
            return [None] * len(xs)
        if len(present) == 1 or not structure_batching():
            return [self._encode(x, train) for x in xs]
        stacked = jnp.concatenate([x for _, x in present], axis=0)
        y = self.encoder(stacked, train, groups=len(present))
        parts = jnp.split(y, len(present), axis=0)
        out = [None] * len(xs)
        for (i, _), p in zip(present, parts):
            out[i] = p
        return out

    def _get_step(self, dto: CaeDto, train: bool):
        return dto.given_variables.time_to_treatment

    def __call__(self, dto: CaeDto, branches: CaeBranches = BRANCH_GTRUTH,
                 train: bool = False) -> CaeDto:
        step = self._get_step(dto, train)
        latents = dto.latents
        if branches.gtruth:
            gv = dto.given_variables.gtruth
            core, penu, lesion = self._encode_many(
                [gv.core, gv.penu, gv.lesion], train)
            latents = latents.replace(gtruth=latents.gtruth.replace(
                core=core, penu=penu, lesion=lesion,
                interpolation=interpolate_latent(core, penu, step)))
        if branches.inputs:
            iv = dto.given_variables.inputs
            core, penu = self._encode_many([iv.core, iv.penu], train)
            latents = latents.replace(inputs=latents.inputs.replace(
                core=core, penu=penu,
                interpolation=interpolate_latent(core, penu, step)))
        if step is not dto.given_variables.time_to_treatment:
            # learned step (Enc3DStep): record it so losses/testers can use it
            dto = dto.replace(given_variables=dto.given_variables.replace(
                time_to_treatment=step))
        return dto.replace(latents=latents)


def _normal_init(mean, std):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


class Enc3DStep(Enc3D):
    """Enc3D + clinical-scalar interpolation-step head
    (reference: Cae3D.py:121-142).  The head runs on the (B, n_globals)
    clinical vector; used when ``time_to_treatment`` is None."""

    def setup(self):
        super().setup()
        g = self.n_ch_global
        self.reduce1 = nn.Dense(g, param_dtype=jnp.float32)
        self.reduce2 = nn.Dense(g // 2, param_dtype=jnp.float32)
        # "crucial and important!" init (reference: Cae3D.py:133-134)
        self.step_head = nn.Dense(1, param_dtype=jnp.float32,
                                  kernel_init=_normal_init(0.0, 0.001),
                                  bias_init=_normal_init(0.5, 0.01))

    def _get_step(self, dto: CaeDto, train: bool):
        step = dto.given_variables.time_to_treatment
        if step is None:
            g = dto.given_variables.globals
            g = g.reshape(g.shape[0], -1)
            h = elu(self.reduce1(g), self.alpha)
            h = elu(self.reduce2(h), self.alpha)
            step = nn.sigmoid(self.step_head(h))
        return step


class Enc3DCtp(Enc3D):
    """Encoder over segmentation ⊕ cropped CBV ⊕ TTD channel concat
    (reference: Cae3D.py:145-169).  ``given.inputs.core/penu`` hold the
    padded CBV/TTD CTP images; ``padding`` crops them back to mask size.
    gtruth branch only."""

    padding: Tuple[int, int, int] = (20, 20, 20)

    def __call__(self, dto: CaeDto, branches: CaeBranches = BRANCH_GTRUTH,
                 train: bool = False) -> CaeDto:
        assert self.channels[0] > 2, "At least 3 channels required"
        pd, ph, pw = self.padding
        # inputs hold padded CTP volumes (B, D, H, W, 1); crop to mask size.
        # The reference indexes [pad0:-pad0, pad1:-pad1, pad2:-pad2] on
        # (D, H, W) (Cae3D.py:160-162).
        def crop(v):
            return v[:, pd:v.shape[1] - pd, ph:v.shape[2] - ph,
                     pw:v.shape[3] - pw, :]

        cbv = crop(dto.given_variables.inputs.core)
        ttd = crop(dto.given_variables.inputs.penu)
        step = self._get_step(dto, train)
        latents = dto.latents
        if branches.gtruth:
            gv = dto.given_variables.gtruth

            def with_ctp(mask):
                if mask is None:
                    return None
                return jnp.concatenate([mask, cbv, ttd], axis=-1)

            core, penu, lesion = self._encode_many(
                [with_ctp(gv.core), with_ctp(gv.penu), with_ctp(gv.lesion)],
                train)
            latents = latents.replace(gtruth=latents.gtruth.replace(
                core=core, penu=penu, lesion=lesion,
                interpolation=interpolate_latent(core, penu, step)))
        return dto.replace(latents=latents)


class DecoderStack(nn.Module):
    """The conv trunk of Dec3D (reference: Cae3D.py:176-220)."""

    channels: Tuple[int, ...]
    alpha: float = 1.0
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        _, origin, d2, d4, d8, fc = self.channels[:6]
        n_classes = self.channels[-1]
        a = self.alpha
        g = groups
        ura = not train
        bn = lambda: BatchNorm(axis_name=self.axis_name,
                               compute_dtype=self.compute_dtype)
        cdt = self.compute_dtype

        if conv_impl() == "pallas_s2d":
            # chained s2d path: stride-2 transposed convs emit cells
            # directly (no re-layout of the upsampled tensor), the
            # pad-(1,2,2) convs and both 1^3 head convs run as fused
            # folded-BN kernels in-domain; the only logical interludes
            # are at the LOW-resolution inputs of each upsampling stage
            def fused(feat, ksz, s):
                sc, sh = bn()(s, ura, fold=True, groups=g)
                pad = (1, 2, 2) if ksz == 3 else "VALID"
                return Conv3d(feat, (ksz,) * 3, padding=pad,
                              compute_dtype=cdt)(
                    s, scale=sc, shift=sh, act="elu", act_param=a)

            x = bn()(x, ura, groups=g)
            x = elu(ConvTranspose3d(d8, (3, 3, 3), (1, 1, 1), cdt)(x), a)
            x = bn()(x, ura, groups=g)
            s = ConvTranspose3d(d4, (3, 3, 3), (2, 2, 2), cdt)(
                x, to_s2d=True, act="elu", act_param=a)
            s = fused(d4, 3, s)
            s = fused(d2, 3, s)
            x = bn()(s2d_unpack(s), ura, groups=g)
            s = ConvTranspose3d(d2, (2, 2, 2), (2, 2, 2), cdt)(
                x, to_s2d=True, act="elu", act_param=a)
            s = fused(d2, 3, s)
            s = fused(origin, 3, s)
            x = bn()(s2d_unpack(s), ura, groups=g)
            s = ConvTranspose3d(origin, (2, 2, 2), (2, 2, 2), cdt)(
                x, to_s2d=True, act="elu", act_param=a)
            s = fused(origin, 3, s)
            s = fused(origin, 3, s)
            s = fused(origin, 1, s)
            sc, sh = bn()(s, ura, fold=True, groups=g)
            s = Conv3d(n_classes, (1, 1, 1), compute_dtype=cdt)(
                s, scale=sc, shift=sh)
            return nn.sigmoid(s2d_unpack(s).astype(jnp.float32))

        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(ConvTranspose3d(d8, (3, 3, 3), (1, 1, 1), cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(ConvTranspose3d(d4, (3, 3, 3), (2, 2, 2), cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(Conv3d(d4, (3, 3, 3), padding=(1, 2, 2), compute_dtype=cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(Conv3d(d2, (3, 3, 3), padding=(1, 2, 2), compute_dtype=cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(ConvTranspose3d(d2, (2, 2, 2), (2, 2, 2), cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(Conv3d(d2, (3, 3, 3), padding=(1, 2, 2), compute_dtype=cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(Conv3d(origin, (3, 3, 3), padding=(1, 2, 2), compute_dtype=cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(ConvTranspose3d(origin, (2, 2, 2), (2, 2, 2), cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(Conv3d(origin, (3, 3, 3), padding=(1, 2, 2), compute_dtype=cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(Conv3d(origin, (3, 3, 3), padding=(1, 2, 2), compute_dtype=cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = elu(Conv3d(origin, (1, 1, 1), compute_dtype=cdt)(x), a)
        x = bn()(x, use_running_average=ura, groups=g)
        x = Conv3d(n_classes, (1, 1, 1), compute_dtype=cdt)(x)
        return nn.sigmoid(x.astype(jnp.float32))


class Dec3D(nn.Module):
    """reference: Cae3D.py:172-239."""

    channels: Tuple[int, ...]
    n_ch_global: int = 5
    alpha: float = 1.0
    axis_name: Optional[str] = None
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.decoder = DecoderStack(self.channels, self.alpha,
                                    self.axis_name, self.compute_dtype)

    def _decode(self, z, train):
        if z is None:
            return None
        return self.decoder(z, train)

    def _decode_many(self, zs, train):
        """Decode several latents in ONE batched trunk pass (group-stacked
        batch axis, per-structure BN statistics); the reference runs the
        decoder once per latent sequentially (Cae3D.py:227-239)."""
        present = [(i, z) for i, z in enumerate(zs) if z is not None]
        if not present:
            return [None] * len(zs)
        if len(present) == 1 or not structure_batching():
            return [self._decode(z, train) for z in zs]
        stacked = jnp.concatenate([z for _, z in present], axis=0)
        y = self.decoder(stacked, train, groups=len(present))
        parts = jnp.split(y, len(present), axis=0)
        out = [None] * len(zs)
        for (i, _), p in zip(present, parts):
            out[i] = p
        return out

    def __call__(self, dto: CaeDto, branches: CaeBranches = BRANCH_GTRUTH,
                 train: bool = False) -> CaeDto:
        recon = dto.reconstructions
        if branches.gtruth:
            lg = dto.latents.gtruth
            core, penu, lesion, interp = self._decode_many(
                [lg.core, lg.penu, lg.lesion, lg.interpolation], train)
            recon = recon.replace(gtruth=recon.gtruth.replace(
                core=core, penu=penu, lesion=lesion, interpolation=interp))
        if branches.inputs:
            li = dto.latents.inputs
            core, penu, interp = self._decode_many(
                [li.core, li.penu, li.interpolation], train)
            recon = recon.replace(inputs=recon.inputs.replace(
                core=core, penu=penu, interpolation=interp))
        return dto.replace(reconstructions=recon)


class Cae3D(nn.Module):
    """enc ∘ dec composition (reference: Cae3D.py:242-256)."""

    enc: nn.Module
    dec: nn.Module

    def __call__(self, dto: CaeDto, branches: CaeBranches = BRANCH_GTRUTH,
                 train: bool = False) -> CaeDto:
        dto = self.enc(dto, branches, train)
        dto = self.dec(dto, branches, train)
        return dto


class Cae3DCtp(Cae3D):
    """reference: Cae3D.py:259-260."""
    pass

"""Inference adapters: batch dict -> DTO -> model forward.

Functional equivalents of the reference's inference mixin layer
(common/inference/Inference.py, UnetInference.py, CaeInference.py,
CaeEncInference.py).  Each adapter is a pure function usable inside jitted
train/eval steps; device staging (`.cuda()` in the reference) is the
caller's sharded device_put.

Batch dict convention (see data/dataset.py): ``images``/``labels`` are
``(B, D, H, W, C)`` jnp arrays, ``clinical`` is ``(B, n_globals)`` with
clinical[:, 0] = tO_to_tA and clinical[:, 1] = tA_to_tR (hours).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from stroke_prediction_tpu.core.dto import (
    BRANCH_GTRUTH, CaeBranches, CaeDto, UnetDto, init_cae_dto, init_unet_dto)

# Visualization intensity caps (reference: common/inference/Inference.py:8-9)
IMSHOW_VMAX_CBV = 12
IMSHOW_VMAX_TTD = 40


def unet_dto_from_batch(images: jnp.ndarray,
                        labels: Optional[jnp.ndarray]) -> UnetDto:
    """reference: common/inference/UnetInference.py:15-26 — labels channel 0
    is the core ground truth, channel 1 the penumbra ground truth."""
    core = penu = None
    if labels is not None:
        core = labels[..., 0:1]
        penu = labels[..., 1:2]
    return init_unet_dto(images, core, penu)


def unet_inference(model, variables, images, labels=None, train: bool = False,
                   mutable=False):
    dto = unet_dto_from_batch(images, labels)
    out = model.apply(variables, dto.given_variables.input_modalities,
                      train=train, mutable=mutable)
    if mutable:
        seg, mut = out
    else:
        seg, mut = out, None
    dto = dto.replace(outputs=dto.outputs.replace(core=seg[..., 0:1],
                                                  penu=seg[..., 1:2]))
    return (dto, mut) if mutable else dto


def normalization_hours(clinical: jnp.ndarray,
                        normalization_hours_penumbra: float = 10.0):
    """``normalization = 10h - tO_to_tA`` (reference: CaeInference.py:18-22)."""
    to_to_ta = clinical[:, 0:1]
    return normalization_hours_penumbra - to_to_ta


def time_to_treatment(clinical: jnp.ndarray, step: Optional[float],
                      normalization_hours_penumbra: float = 10.0,
                      learn_step: bool = False) -> Optional[jnp.ndarray]:
    """Normalized interpolation step (B, 1).

    * step None (training/gt eval): tA_to_tR / normalization
      (reference: CaeInference.py:24-31).
    * step given (counterfactual sweeps): step / normalization.
    * learn_step and step None: returns None so Enc3DStep's clinical head
      regresses the step (reference: CaeStepLearner.py:23-29).
    """
    norm = normalization_hours(clinical, normalization_hours_penumbra)
    if step is None:
        if learn_step:
            return None
        return clinical[:, 1:2] / norm
    return jnp.asarray(step, jnp.float32) * jnp.ones_like(norm) / norm


def cae_dto_from_batch(images: Optional[jnp.ndarray],
                       labels: Optional[jnp.ndarray],
                       clinical: jnp.ndarray,
                       step: Optional[float] = None,
                       normalization_hours_penumbra: float = 10.0,
                       learn_step: bool = False,
                       inputs_from_images: bool = False) -> CaeDto:
    """Builds the CaeDto given variables.

    * gtruth branch: labels channels 0/1/2 = core/penumbra/lesion masks
      (reference: CaeInference.py:49-60).
    * ``inputs_from_images``: stage images channels 0/1 (U-Net core/penu
      segmentations, or padded CBV/TTD for the CTP encoder) as the inputs
      branch (reference: CaeEncInference.py:20-28).
    """
    b = clinical.shape[0]
    ttt = time_to_treatment(clinical, step, normalization_hours_penumbra,
                            learn_step)
    gtruth_core = gtruth_penu = gtruth_lesion = None
    if labels is not None:
        gtruth_core = labels[..., 0:1]
        gtruth_penu = labels[..., 1:2]
        gtruth_lesion = labels[..., 2:3]
    inputs_core = inputs_penu = None
    if inputs_from_images and images is not None:
        inputs_core = images[..., 0:1]
        inputs_penu = images[..., 1:2]
    return init_cae_dto(
        global_variables=clinical,
        time_to_treatment=ttt,
        type_core=jnp.zeros((b, 1), jnp.float32),
        type_penumbra=jnp.ones((b, 1), jnp.float32),
        inputs_core=inputs_core, inputs_penu=inputs_penu,
        gtruth_core=gtruth_core, gtruth_penumbra=gtruth_penu,
        gtruth_lesion=gtruth_lesion)


def cae_inference(model, variables, dto: CaeDto,
                  branches: CaeBranches = BRANCH_GTRUTH,
                  train: bool = False, mutable=False):
    """Full CAE forward (reference: CaeInference.py:62-69)."""
    return model.apply(variables, dto, branches, train, mutable=mutable)


def cae_enc_inference(cae_model, cae_variables, enc_model, enc_variables,
                      dto: CaeDto, train: bool = False, enc_mutable=False):
    """Two-model phase-2 inference (reference: CaeEncInference.py:30-42):
    new encoder + frozen CAE decoder on the inputs branch, then the frozen
    full CAE on the gtruth branch.  The reference's ``.mode``/``.flag``
    confusion (SURVEY.md §2 #26) is resolved to the intended semantics:
    inputs branch first, then gtruth branch."""
    from stroke_prediction_tpu.core.dto import BRANCH_INPUTS

    out = enc_model.apply(enc_variables, dto, BRANCH_INPUTS, train,
                          mutable=enc_mutable)
    if enc_mutable:
        dto, mut = out
    else:
        dto, mut = out, None
    # frozen CAE decoder over the inputs-branch latents
    dto = cae_model.apply(cae_variables, dto, BRANCH_INPUTS, False,
                          method=lambda m, d, b, t: m.dec(d, b, t))
    # frozen full CAE over the gtruth branch (supervision targets)
    dto = cae_model.apply(cae_variables, dto, BRANCH_GTRUTH, False)
    return (dto, mut) if enc_mutable else dto

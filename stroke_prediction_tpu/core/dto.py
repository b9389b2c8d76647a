"""Typed pytree data-transfer objects.

The reference threads dict-backed ``Dto`` records through every layer
(reference: common/dto/Dto.py, UnetDto.py, CaeDto.py).  Here they are frozen
``flax.struct`` dataclasses, i.e. real JAX pytrees: they flow through ``jit``
/ ``grad`` / shardings unchanged, and ``None`` fields are simply absent
leaves, so partially-filled records trace to fixed computation graphs.

The reference's runtime branch selection (``flag`` in
{FLAG_DEFAULT, FLAG_GTRUTH, FLAG_INPUTS}, common/dto/CaeDto.py:3-5 and
Cae3D.py:100-118) is replaced by *static* branch configuration
(:class:`CaeBranches`) passed as a static argument, so each configuration
compiles once to a fixed graph instead of relying on None-checks at run time.

All volumes are channels-last ``(B, D, H, W, C)`` jnp arrays.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.struct as struct

Array = Any  # jnp.ndarray | None


# --------------------------------------------------------------------------
# U-Net (reference: common/dto/UnetDto.py)
# --------------------------------------------------------------------------

@struct.dataclass
class UnetGiven:
    input_modalities: Array = None      # (B, D, H, W, 2)  CBV ⊕ TTD
    core: Array = None                  # (B, D, H, W, 1)  manual core gt
    penu: Array = None                  # (B, D, H, W, 1)  manual penumbra gt
    lesion: Array = None                # (B, D, H, W, 1)  follow-up lesion gt


@struct.dataclass
class UnetOutputs:
    core: Array = None
    penu: Array = None
    lesion: Array = None


@struct.dataclass
class UnetDto:
    given_variables: UnetGiven
    outputs: UnetOutputs


def init_unet_dto(input_modalities, gtruth_core=None, gtruth_penumbra=None,
                  gtruth_lesion=None) -> UnetDto:
    """reference: common/dto/UnetDto.py:13-28."""
    return UnetDto(
        given_variables=UnetGiven(input_modalities=input_modalities,
                                  core=gtruth_core, penu=gtruth_penumbra,
                                  lesion=gtruth_lesion),
        outputs=UnetOutputs(),
    )


# --------------------------------------------------------------------------
# CAE (reference: common/dto/CaeDto.py)
# --------------------------------------------------------------------------

@struct.dataclass
class CaeBranch:
    """One of the gtruth / inputs branches of latents or reconstructions."""

    core: Array = None
    penu: Array = None
    lesion: Array = None            # gtruth branch only
    interpolation: Array = None


@struct.dataclass
class CaePair:
    inputs: CaeBranch
    gtruth: CaeBranch


@struct.dataclass
class CaeGiven:
    globals: Array = None             # (B, n_globals) clinical scalars
    time_to_treatment: Array = None   # (B, 1) normalized step, or None
    type_core: Array = None           # (B, 1) aux zeros
    type_penumbra: Array = None       # (B, 1) aux ones
    inputs: CaeBranch = None          # CTP images or U-Net segmentations
    gtruth: CaeBranch = None          # manual segmentation masks


@struct.dataclass
class CaeDto:
    given_variables: CaeGiven
    latents: CaePair
    reconstructions: CaePair


def init_cae_dto(global_variables=None, time_to_treatment=None,
                 type_core=None, type_penumbra=None,
                 inputs_core=None, inputs_penu=None,
                 gtruth_core=None, gtruth_penumbra=None,
                 gtruth_lesion=None) -> CaeDto:
    """reference: common/dto/CaeDto.py:19-46 (with the latents /
    reconstructions ctor swap fixed; the subtrees are isomorphic so the
    reference bug was harmless)."""
    empty = CaePair(inputs=CaeBranch(), gtruth=CaeBranch())
    return CaeDto(
        given_variables=CaeGiven(
            globals=global_variables,
            time_to_treatment=time_to_treatment,
            type_core=type_core, type_penumbra=type_penumbra,
            inputs=CaeBranch(core=inputs_core, penu=inputs_penu),
            gtruth=CaeBranch(core=gtruth_core, penu=gtruth_penumbra,
                             lesion=gtruth_lesion)),
        latents=empty,
        reconstructions=CaePair(inputs=CaeBranch(), gtruth=CaeBranch()),
    )


# Static branch configuration: replaces the reference's runtime flag
# (FLAG_GTRUTH / FLAG_INPUTS / FLAG_DEFAULT, common/dto/CaeDto.py:3-5).
@struct.dataclass
class CaeBranches:
    gtruth: bool = struct.field(pytree_node=False, default=True)
    inputs: bool = struct.field(pytree_node=False, default=False)


BRANCH_GTRUTH = CaeBranches(gtruth=True, inputs=False)
BRANCH_INPUTS = CaeBranches(gtruth=False, inputs=True)
BRANCH_BOTH = CaeBranches(gtruth=True, inputs=True)


# --------------------------------------------------------------------------
# Metric measures (reference: common/dto/MetricMeasuresDto.py)
# --------------------------------------------------------------------------

@struct.dataclass
class BinaryMeasures:
    """Per-structure binary metrics (reference: MetricMeasuresDto.py:27-46)."""

    dc: Array = None
    hd: Array = None
    assd: Array = None
    precision: Array = None
    sensitivity: Array = None       # recall
    specificity: Array = None

    @property
    def prc_euclidean_distance(self):
        """Distance to the ideal top-right corner (1,1) of the PR plot
        (reference: MetricMeasuresDto.py:38-46)."""
        import numpy as np
        if self.precision is None or self.sensitivity is None:
            return None
        return np.sqrt((1 - self.precision) ** 2 + (1 - self.sensitivity) ** 2)

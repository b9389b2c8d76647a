"""Experiment configuration dataclasses.

Mirrors the reference CLI contract (reference: common/util.py:40-145,
``ExpParser``/``CAEParser``/``UnetParser``/``SDMParser``) as typed, frozen
dataclasses.  CLI parsing lives in :mod:`stroke_prediction_tpu.utils.args`;
these objects are what the rest of the framework consumes, so programmatic
use never needs argparse.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


def _t(x) -> Tuple:
    return tuple(x) if x is not None else None


@dataclasses.dataclass(frozen=True)
class ExpConfig:
    """Base experiment flags (reference: common/util.py:40-58)."""

    fold: Tuple[int, ...] = tuple(range(29))   # case indices of the fold
    hemisflipid: float = 15                    # flip cases with id > this
    validsetsize: float = 0.5                  # fraction used for validation
    seed: int = 4                              # seed for all randomization
    xyoriginal: int = 256                      # original in-plane size
    xyresample: float = 0.5                    # in-plane resample factor
    zsize: int = 28                            # number of z slices
    padding: Tuple[int, int, int] = (20, 20, 20)
    lrsteps: Tuple[int, ...] = ()              # MultiStep LR milestones

    @property
    def resample_size(self) -> int:
        # reference: train_shape_reconstruction.py:17
        return int(self.xyoriginal * self.xyresample)

    def replace(self, **kw):
        for k in ("fold", "padding", "lrsteps"):
            if k in kw:
                kw[k] = _t(kw[k])
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class CaeConfig(ExpConfig):
    """CAE training flags (reference: common/util.py:61-70)."""

    epochs: int = 300
    batchsize: int = 4
    globals_: int = 5            # number of clinical global scalars
    normalize: int = 10          # penumbra normalization (hours)
    inbasepath: Optional[str] = None
    outbasepath: str = "/tmp/tmp_out"
    steplearning: bool = False
    channelscae: Tuple[int, ...] = (1, 16, 24, 32, 100, 200, 1)
    caepath: Optional[str] = None        # phase-1 model (step/prediction)
    channelsenc: Tuple[int, ...] = (1, 16, 24, 32, 100, 200, 1)
    initbycae: bool = False

    def replace(self, **kw):
        for k in ("channelscae", "channelsenc"):
            if k in kw:
                kw[k] = _t(kw[k])
        return ExpConfig.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class UnetConfig(ExpConfig):
    """U-Net training flags (reference: common/util.py:73-82)."""

    unetpath: str = "/tmp/unet.model"
    channels: Tuple[int, ...] = (2, 16, 32, 64, 32, 16, 32, 2)
    epochs: int = 200
    batchsize: int = 6           # reference: train_unet_segmentation.py:12
    inbasepath: Optional[str] = None
    outbasepath: str = "/tmp/unet"
    patchsize: Tuple[int, int, int] = (104, 104, 68)   # W, H, D patch

    def replace(self, **kw):
        for k in ("channels", "patchsize"):
            if k in kw:
                kw[k] = _t(kw[k])
        return ExpConfig.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SdmConfig(ExpConfig):
    """SDM baseline flags (reference: common/util.py:85-96)."""

    unet: str = "/tmp/unet.model"
    channels: Tuple[int, ...] = (2, 16, 32, 64, 32, 16, 32, 2)
    downsample: int = 1
    groundtruth: int = 1
    visualinspection: int = 0
    outbasepath: str = "/tmp/sdm"
    normalize: int = 10


@dataclasses.dataclass(frozen=True)
class ShapeTestConfig:
    """Multi-model/multi-fold CAE test flags (reference: common/util.py:128-139)."""

    path: Tuple[str, ...] = ()
    fold: Tuple[Tuple[int, ...], ...] = ()
    normalize: int = 10
    outbasepath: str = "/tmp/shape"
    xyresample: float = 0.5
    padding: Tuple[int, int, int] = (20, 20, 20)

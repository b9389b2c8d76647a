"""CLI flag system, preserving the reference's contract.

reference: common/util.py:40-145 — the ``ExpParser`` / ``CAEParser`` /
``UnetParser`` / ``SDMParser`` hierarchy and the ``get_args_*`` entry
helpers, with the same flags and defaults.  Additions for the TPU
framework (all optional, defaulted to reference behavior):

  * ``--datadir`` / ``--clinicalcsv`` — NIfTI dataset location (the
    reference hardcodes an institute share, common/data.py:32-33).
  * ``--synthetic`` — run on the generated synthetic dataset instead of
    the closed clinical one.
  * ``--ndevices`` — data-parallel device count (mesh size).
"""

from __future__ import annotations

import argparse


class ExpParser(argparse.ArgumentParser):
    """reference: common/util.py:40-58."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.add_argument("--fold", type=int, nargs="+",
                          help="Fold case indices", default=list(range(29)))
        self.add_argument("--hemisflipid", type=float, default=15,
                          help="Case id or greater at which hemispheric flip is applied")
        self.add_argument("--validsetsize", type=float, default=0.5,
                          help="Fraction of validation set size")
        self.add_argument("--seed", type=int, default=4,
                          help="Seed for any randomization")
        self.add_argument("--xyoriginal", type=int, default=256,
                          help="Original size of slices")
        self.add_argument("--xyresample", type=float, default=0.5,
                          help="Factor for resampling slices")
        self.add_argument("--zsize", type=int, default=28,
                          help="Number of z slices")
        self.add_argument("--padding", type=int, nargs="+",
                          default=[20, 20, 20], help="Padding of patches")
        self.add_argument("--lrsteps", type=int, nargs="+", default=[],
                          help="MultiStepLR epochs")
        # TPU-framework additions
        self.add_argument("--datadir", type=str, default=None,
                          help="NIfTI dataset root directory")
        self.add_argument("--clinicalcsv", type=str, default=None,
                          help="Clinical CSV path")
        self.add_argument("--synthetic", action="store_true", default=False,
                          help="Use the synthetic stand-in dataset")
        self.add_argument("--ndevices", type=int, default=1,
                          help="Data-parallel device count")
        self.add_argument("--dtype", type=str, default="bfloat16",
                          choices=["bfloat16", "float32"],
                          help="Model compute dtype (params stay float32)")
        self.add_argument("--fastmetrics", action="store_true",
                          default=True,
                          help="No-op, kept for compatibility: by default "
                               "HD/ASSD are computed on validation batches "
                               "only (reference-shaped per-epoch ASSD "
                               "curves); use --distances for every batch")
        self.add_argument("--distances", action="store_true",
                          default=False,
                          help="Compute HD/ASSD every training AND "
                               "validation batch like the reference "
                               "(default: validation only); slow compiles "
                               "on the CAE configs")
        self.add_argument("--profile", type=str, default=None,
                          metavar="LOGDIR",
                          help="Capture a jax.profiler device trace of one "
                               "training epoch (the second, post-compile) "
                               "into LOGDIR")
        self.add_argument("--distributed", action="store_true",
                          default=False,
                          help="Initialize the JAX multi-host runtime "
                               "(auto-detected coordinator on TPU pods; "
                               "see --coordinator/--nprocs/--procid)")
        self.add_argument("--coordinator", type=str, default=None,
                          metavar="HOST:PORT",
                          help="Distributed coordinator address (omit on "
                               "TPU pods for auto-detection)")
        self.add_argument("--nprocs", type=int, default=None,
                          help="Distributed process count (omit on TPU "
                               "pods)")
        self.add_argument("--procid", type=int, default=None,
                          help="This process's distributed rank (omit on "
                               "TPU pods)")

    def parse_args(self, args=None, namespace=None):
        ns = super().parse_args(args, namespace)
        print(ns)
        return ns


class CAEParser(ExpParser):
    """reference: common/util.py:61-70."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.add_argument("--epochs", type=int, default=300)
        self.add_argument("--batchsize", type=int, default=4)
        self.add_argument("--globals", type=int, default=5,
                          help="Number of global variables")
        self.add_argument("--normalize", type=int, default=10,
                          help="Normalization corresponding to penumbra (hours)")
        self.add_argument("--inbasepath", type=str, default=None,
                          help="Path and filename base for loading")
        self.add_argument("--outbasepath", type=str, default="/tmp/tmp_out",
                          help="Path and filename base for saving")
        self.add_argument("--steplearning", action="store_true",
                          default=False,
                          help="Also learn interpolation step from clinical data")


class UnetParser(ExpParser):
    """reference: common/util.py:73-82."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.add_argument("unetpath", type=str,
                          help="Path to model of Unet")
        self.add_argument("--channels", type=int, nargs="+",
                          default=[2, 16, 32, 64, 32, 16, 32, 2],
                          help="Unet channels")
        self.add_argument("--epochs", type=int, default=200)
        self.add_argument("--inbasepath", type=str, default=None)
        self.add_argument("--outbasepath", type=str, default="/tmp/unet")
        self.add_argument("--batchsize", type=int, default=6)


class SDMParser(ExpParser):
    """reference: common/util.py:85-96."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.add_argument("unet", type=str, nargs="?",
                          default="/tmp/unet.model",
                          help="Path to model of Segmentation Unet")
        self.add_argument("--channels", type=int, nargs="+",
                          default=[2, 16, 32, 64, 32, 16, 32, 2])
        self.add_argument("--downsample", type=int, default=1,
                          help="Downsampling to CAE latent representation size")
        self.add_argument("--groundtruth", type=int, default=1,
                          help="Use groundtruth instead of UNet segmentations")
        self.add_argument("--visualinspection", type=int, default=0)
        self.add_argument("--outbasepath", type=str, default="/tmp/sdm")
        self.add_argument("--normalize", type=int, default=10)


def get_args_sdm():
    return SDMParser().parse_args()


def get_args_shape_training():
    """reference: common/util.py:105-109."""
    parser = CAEParser()
    parser.add_argument("--channelscae", type=int, nargs="+",
                        default=[1, 16, 24, 32, 100, 200, 1],
                        help="CAE channels")
    return parser.parse_args()


def get_args_step_training():
    """reference: common/util.py:111-116."""
    parser = CAEParser()
    parser.add_argument("caepath", type=str,
                        help="Path to previously trained cae phase1 model")
    parser.add_argument("--channelscae", type=int, nargs="+",
                        default=[1, 16, 24, 32, 100, 200, 1])
    return parser.parse_args()


def get_args_shape_prediction_training():
    """reference: common/util.py:119-125."""
    parser = CAEParser()
    parser.add_argument("caepath", type=str,
                        help="Path to previously trained cae phase1 model")
    parser.add_argument("--channelsenc", type=int, nargs="+",
                        default=[1, 16, 24, 32, 100, 200, 1])
    parser.add_argument("--initbycae", action="store_true", default=False,
                        help="Init enc weights by cae's enc")
    return parser.parse_args()


def get_args_shape_testing():
    """reference: common/util.py:128-139."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", action="append", type=str,
                        help="Path to model of Shape CAE")
    parser.add_argument("--fold", action="append", type=int, nargs="+",
                        help="Fold case indices")
    parser.add_argument("--normalize", type=int, default=10)
    parser.add_argument("--outbasepath", type=str, default="/tmp/shape")
    parser.add_argument("--xyresample", type=float, default=0.5)
    parser.add_argument("--xyoriginal", type=int, default=256)
    parser.add_argument("--zsize", type=int, default=28)
    parser.add_argument("--padding", type=int, nargs="+",
                        default=[20, 20, 20])
    parser.add_argument("--hemisflipid", type=float, default=15)
    parser.add_argument("--seed", type=int, default=4)
    parser.add_argument("--datadir", type=str, default=None)
    parser.add_argument("--clinicalcsv", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true", default=False)
    args = parser.parse_args()
    print(args)
    return args


def get_args_unet_training():
    """reference: common/util.py:142-145."""
    return UnetParser().parse_args()

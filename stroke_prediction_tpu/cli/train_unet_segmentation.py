"""Train the 3-D U-Net on core/penumbra segmentation.

reference: train_unet_segmentation.py (with its bit-rot fixed — the
reference's learner ctor call no longer matched the signature, SURVEY.md
§2 #39; this implements the intended wiring): Adam(1e-3, wd 1e-5, betas
(0.99, 0.999)), optional MultiStepLR, Dice loss, patch pipeline
resample→fixed-flip→pad(20³)→random-patch(104,104,68), batch size 6.
"""

import datetime

from stroke_prediction_tpu.cli.common import make_dataset, make_mesh
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.data.loader import get_stroke_shape_training_data
from stroke_prediction_tpu.models.unet3d import Unet3D
from stroke_prediction_tpu.train.optim import make_optimizer, multistep_lr
from stroke_prediction_tpu.train.unet_learner import UnetSegmentationLearner
from stroke_prediction_tpu.utils.args import get_args_unet_training


def train(args):
    learning_rate = 1e-3
    betas = (0.99, 0.999)
    pad = tuple(args.padding)
    patch = (104, 104, 68)
    if args.synthetic and args.xyoriginal < 256:
        # small synthetic smoke geometry: patch = minimum valid-conv size
        patch = (44, 44, 44)

    import jax.numpy as jnp
    cd = jnp.dtype(args.dtype)
    unet = Unet3D(channels=tuple(args.channels), compute_dtype=cd)
    tx = make_optimizer(learning_rate, betas=betas, weight_decay=1e-5)
    sched = multistep_lr(learning_rate, args.lrsteps) if args.lrsteps else None

    dataset = make_dataset(args, [MOD_CBV, MOD_TTD],
                           [LABEL_CORE, LABEL_PENU],
                           flip_split_id=args.hemisflipid, pad=pad)
    ds_train, ds_valid = get_stroke_shape_training_data(
        dataset, args.fold, args.validsetsize, seed=args.seed,
        batchsize=args.batchsize, process_shard=args.distributed)
    print("Size training set:", len(ds_train.indices),
          "samples | Size validation set:",
          len(ds_valid.indices) if ds_valid else 0,
          "samples | Capacity batch:", args.batchsize, "samples")
    print("# training batches:", len(ds_train),
          "| # validation batches:", len(ds_valid) if ds_valid else 0)

    learner = UnetSegmentationLearner(
        ds_train, ds_valid, unet, tx, sched, n_epochs=args.epochs,
        patch_whd=patch, pad_xyz=pad,
        path_previous_base=args.inbasepath,
        path_outputs_base=args.outbasepath, seed=args.seed,
        metrics_with_distances=(True if args.distances else "validation"),
        profile_dir=args.profile,
        mesh=make_mesh(args))
    learner.run_training()


if __name__ == "__main__":
    print(datetime.datetime.now())
    train(get_args_unet_training())
    print(datetime.datetime.now())

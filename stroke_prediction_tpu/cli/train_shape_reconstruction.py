"""Phase-1 CAE training: learn the lesion shape space on manual masks.

reference: train_shape_reconstruction.py — Enc3D (or Enc3DStep with
--steplearning, which also disables the validation split), Dec3D, Adam
(1e-3, (0.9, 0.999), wd 1e-5), Dice criterion, transforms
resample→random-flip→elastic→tensor; CBV/TTD images are staged only for
visualization.
"""

import datetime

from stroke_prediction_tpu.cli.common import make_dataset, make_mesh
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.data.loader import get_stroke_shape_training_data
from stroke_prediction_tpu.models.cae3d import Cae3D, Dec3D, Enc3D, Enc3DStep
from stroke_prediction_tpu.train.cae_learners import CaeReconstructionLearner
from stroke_prediction_tpu.train.optim import make_optimizer, multistep_lr
from stroke_prediction_tpu.utils.args import get_args_shape_training


def train(args):
    use_validation = not args.steplearning
    learning_rate = 1e-3
    betas = (0.9, 0.999)

    enc_cls = Enc3DStep if args.steplearning else Enc3D
    import jax.numpy as jnp
    cd = jnp.dtype(args.dtype)
    enc = enc_cls(channels=tuple(args.channelscae),
                  n_ch_global=args.globals, alpha=1.0, compute_dtype=cd)
    dec = Dec3D(channels=tuple(args.channelscae),
                n_ch_global=args.globals, alpha=1.0, compute_dtype=cd)
    cae = Cae3D(enc=enc, dec=dec)

    tx = make_optimizer(learning_rate, betas=betas, weight_decay=1e-5)
    sched = multistep_lr(learning_rate, args.lrsteps) if args.lrsteps else None

    dataset = make_dataset(args, [MOD_CBV, MOD_TTD],
                           [LABEL_CORE, LABEL_PENU, LABEL_LESION])
    ds_train, ds_valid = get_stroke_shape_training_data(
        dataset, args.fold, args.validsetsize, seed=args.seed,
        batchsize=args.batchsize, split=use_validation,
        process_shard=args.distributed)
    print("Size training set:", len(ds_train.indices),
          "samples | Size validation set:",
          len(ds_valid.indices) if ds_valid else 0,
          "samples | Capacity batch:", args.batchsize, "samples")
    print("# training batches:", len(ds_train),
          "| # validation batches:", len(ds_valid) if ds_valid else 0)

    # the reference keeps CaeReconstructionLearner even with --steplearning
    # (train_shape_reconstruction.py:68-73); the step head trains later via
    # train_interpolationstep_after_reconstruction.py's CaeStepLearner
    learner = CaeReconstructionLearner(
        ds_train, ds_valid, cae, tx, sched, n_epochs=args.epochs,
                  normalization_hours_penumbra=args.normalize,
                  base_betas=betas,
                  path_previous_base=args.inbasepath,
                  path_outputs_base=args.outbasepath, seed=args.seed,
                  metrics_with_distances=(True if args.distances else "validation"),
        profile_dir=args.profile,
        mesh=make_mesh(args))
    learner.run_training()


if __name__ == "__main__":
    print(datetime.datetime.now())
    train(get_args_shape_training())
    print(datetime.datetime.now())

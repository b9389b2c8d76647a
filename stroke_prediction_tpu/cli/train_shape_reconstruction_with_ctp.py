"""CTP-conditioned phase-1 CAE training.

reference: train_shape_reconstruction_with_ctp.py (with its bit-rot fixed
— undefined ``args.continuetraining``, wrong kwargs, mismatched learner
args; SURVEY.md §2 #43 says to build the intended behavior): Enc3DCtp
encodes segmentation ⊕ cropped CBV ⊕ TTD, so the padded CTP images are
staged as the inputs branch and the channel spec's first entry must be
>= 3.  Transforms: resample → fixed flip → pad → elastic (labels only).
"""

import datetime

from stroke_prediction_tpu.cli.common import make_dataset, make_mesh
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.data.loader import get_stroke_shape_training_data
from stroke_prediction_tpu.models.cae3d import Cae3DCtp, Dec3D, Enc3DCtp
from stroke_prediction_tpu.train.cae_learners import CaeReconstructionLearner
from stroke_prediction_tpu.train.optim import make_optimizer, multistep_lr
from stroke_prediction_tpu.utils.args import get_args_shape_training


def train(args):
    learning_rate = 1e-3
    betas = (0.99, 0.999)
    pad = tuple(args.padding)

    import jax.numpy as jnp
    cd = jnp.dtype(args.dtype)
    enc = Enc3DCtp(channels=tuple(args.channelscae),
                   n_ch_global=args.globals, alpha=1.0, padding=pad,
                   compute_dtype=cd)
    dec = Dec3D(channels=tuple(args.channelscae),
                n_ch_global=args.globals, alpha=1.0, compute_dtype=cd)
    cae = Cae3DCtp(enc=enc, dec=dec)

    tx = make_optimizer(learning_rate, betas=betas, weight_decay=1e-5)
    sched = multistep_lr(learning_rate, args.lrsteps) if args.lrsteps else None

    dataset = make_dataset(args, [MOD_CBV, MOD_TTD],
                           [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                           flip_split_id=args.hemisflipid, pad=pad)
    ds_train, ds_valid = get_stroke_shape_training_data(
        dataset, args.fold, args.validsetsize, seed=args.seed,
        batchsize=args.batchsize, process_shard=args.distributed)
    print("Size training set:", len(ds_train.indices),
          "samples | Size validation set:",
          len(ds_valid.indices) if ds_valid else 0,
          "samples | Capacity batch:", args.batchsize, "samples")

    learner = CaeReconstructionLearner(
        ds_train, ds_valid, cae, tx, sched, n_epochs=args.epochs,
        normalization_hours_penumbra=args.normalize, base_betas=betas,
        inputs_from_images=True,     # padded CBV/TTD feed the CTP encoder
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

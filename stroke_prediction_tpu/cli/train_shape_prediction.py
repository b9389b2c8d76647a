"""Phase-2 training: adapted encoder predicts from U-Net segmentations.

reference: train_shape_prediction.py — load the frozen phase-1 CAE, build
a new Enc3D (optionally initialized from the CAE's encoder via
--initbycae), train it on '_unet_core'/'_unet_penu' modality inputs
against gtruth labels via CaePredictionLearner; elastic deformation is
applied to the images too (:51).
"""

import datetime

from stroke_prediction_tpu.cli.common import make_dataset, make_mesh
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_UNET_CORE, MOD_UNET_PENU)
from stroke_prediction_tpu.data.loader import (
    get_stroke_prediction_training_data)
from stroke_prediction_tpu.models.cae3d import Enc3D
from stroke_prediction_tpu.models.factory import load_model
from stroke_prediction_tpu.train.cae_learners import CaePredictionLearner
from stroke_prediction_tpu.train.optim import make_optimizer, multistep_lr
from stroke_prediction_tpu.utils.args import (
    get_args_shape_prediction_training)


def train(args):
    learning_rate = 1e-3
    betas = (0.9, 0.999)

    cae, cae_vars = load_model(args.caepath)
    import jax.numpy as jnp
    cd = jnp.dtype(args.dtype)
    enc = Enc3D(channels=tuple(args.channelsenc),
                n_ch_global=args.globals, alpha=1.0, compute_dtype=cd)

    tx = make_optimizer(learning_rate, betas=betas, weight_decay=1e-5)
    sched = multistep_lr(learning_rate, args.lrsteps) if args.lrsteps else None

    dataset = make_dataset(args, [MOD_UNET_CORE, MOD_UNET_PENU],
                           [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                           flip_split_id=args.hemisflipid)
    ds_train, ds_valid = get_stroke_prediction_training_data(
        dataset, args.fold, args.validsetsize, seed=args.seed,
        batchsize=args.batchsize, process_shard=args.distributed)
    print("Size training set:", len(ds_train.indices),
          "samples | Size validation set:",
          len(ds_valid.indices) if ds_valid else 0,
          "samples | Capacity batch:", args.batchsize, "samples")

    learner = CaePredictionLearner(
        ds_train, ds_valid, cae, cae_vars, enc, tx, sched,
        n_epochs=args.epochs,
        normalization_hours_penumbra=args.normalize, base_betas=betas,
        path_previous_base=args.inbasepath,
        path_outputs_base=args.outbasepath, seed=args.seed,
        metrics_with_distances=(True if args.distances else "validation"),
        profile_dir=args.profile,
        mesh=make_mesh(args))

    if args.initbycae:
        # clone the phase-1 encoder weights into the new encoder
        # (reference: train_shape_prediction.py:26-30)
        params = dict(learner._state.params)
        params["encoder"] = cae_vars["params"]["enc"]["encoder"]
        bs = dict(learner._state.batch_stats)
        if cae_vars["batch_stats"]:
            bs["encoder"] = cae_vars["batch_stats"]["enc"]["encoder"]
        learner._state = learner._state.replace(params=params,
                                                batch_stats=bs)

    learner.run_training()


if __name__ == "__main__":
    print(datetime.datetime.now())
    train(get_args_shape_prediction_training())
    print(datetime.datetime.now())

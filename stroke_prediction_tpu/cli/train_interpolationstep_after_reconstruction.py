"""Train the interpolation-step head on a frozen phase-1 shape space.

reference: train_interpolationstep_after_reconstruction.py — load the
frozen phase-1 CAE, build a fresh Enc3DStep whose conv trunk is grafted
from the CAE's encoder (``enc.encoder = cae.enc.encoder``, :25), reuse the
CAE's decoder, and train only the step head (the frozen parts contribute
no gradients) via CaeStepLearner.
"""

import datetime

from stroke_prediction_tpu.cli.common import make_dataset, make_mesh
from stroke_prediction_tpu.core.dto import BRANCH_GTRUTH
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.data.loader import get_stroke_shape_training_data
from stroke_prediction_tpu.models.cae3d import Cae3D, Dec3D, Enc3DStep
from stroke_prediction_tpu.models.factory import load_model
from stroke_prediction_tpu.train.cae_learners import CaeStepLearner
from stroke_prediction_tpu.train.optim import (
    make_optimizer, multistep_lr, trainable_mask_by_path)
from stroke_prediction_tpu.utils.args import get_args_step_training


def train(args):
    learning_rate = 1e-3
    betas = (0.9, 0.999)

    # frozen phase-1 CAE
    cae_loaded, cae_vars = load_model(args.caepath)

    # fresh Enc3DStep; its conv trunk takes the CAE encoder's weights
    import jax.numpy as jnp
    cd = jnp.dtype(args.dtype)
    enc = Enc3DStep(channels=tuple(args.channelscae),
                    n_ch_global=args.globals, alpha=1.0, compute_dtype=cd)
    dec = Dec3D(channels=tuple(args.channelscae),
                n_ch_global=args.globals, alpha=1.0, compute_dtype=cd)
    cae = Cae3D(enc=enc, dec=dec)

    dataset = make_dataset(args, [MOD_CBV, MOD_TTD],
                           [LABEL_CORE, LABEL_PENU, LABEL_LESION])
    ds_train, ds_valid = get_stroke_shape_training_data(
        dataset, args.fold, args.validsetsize, seed=args.seed,
        batchsize=args.batchsize, process_shard=args.distributed)
    print("Size training set:", len(ds_train.indices),
          "samples | Size validation set:",
          len(ds_valid.indices) if ds_valid else 0)

    # Only the clinical step head trains; the grafted encoder/decoder stay
    # frozen (reference grafts modules whose params have requires_grad
    # False, :22-34)
    tx_factory = lambda params: make_optimizer(
        learning_rate, betas=betas, weight_decay=1e-5,
        trainable_mask=trainable_mask_by_path(
            params, ("reduce1", "reduce2", "step_head")))

    learner = CaeStepLearner(
        ds_train, ds_valid, cae, tx_factory, multistep_lr(
            learning_rate, args.lrsteps) if args.lrsteps else None,
        n_epochs=args.epochs,
        normalization_hours_penumbra=args.normalize, base_betas=betas,
        path_previous_base=args.inbasepath,
        path_outputs_base=args.outbasepath, seed=args.seed,
        metrics_with_distances=(True if args.distances else "validation"),
        profile_dir=args.profile,
        mesh=make_mesh(args))

    # graft the frozen CAE weights into the freshly-initialized state
    params = dict(learner._state.params)
    params["enc"] = dict(params["enc"])
    params["enc"]["encoder"] = cae_vars["params"]["enc"]["encoder"]
    params["dec"] = cae_vars["params"]["dec"]
    bs = dict(learner._state.batch_stats)
    if cae_vars["batch_stats"]:
        bs["enc"] = dict(bs.get("enc", {}))
        bs["enc"]["encoder"] = cae_vars["batch_stats"]["enc"]["encoder"]
        bs["dec"] = cae_vars["batch_stats"]["dec"]
    learner._state = learner._state.replace(params=params, batch_stats=bs)
    learner.run_training()


if __name__ == "__main__":
    print(datetime.datetime.now())
    train(get_args_step_training())
    print(datetime.datetime.now())

"""JAX/TPU side of the Dice-parity protocol (BASELINE.json: "Dice parity
±0.005 across folds").

Runs the framework's own learners on the SAME synthetic 29-case dataset,
folds, seeds and hyperparameters as tools/parity_torch.py and dumps the
full metric curves in the same JSON schema
({"training": [...], "validate": [...]}) for tools/parity_report.py.

Run (TPU, default env from /root/repo):
  python tools/parity_jax.py --config unet --epochs 35 \
      --fold 0 1 ... 19 --out /root/repo/parity/unet_fold0_jax.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(config: str, seed: int, xyoriginal: int = 256,
                  zsize: int = 28):
    from stroke_prediction_tpu.data.dataset import (
        LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD,
        StrokeDataset3D, SyntheticCaseProvider)

    provider = SyntheticCaseProvider(
        n_cases=29, shape_xyz=(xyoriginal, xyoriginal, zsize), seed=seed,
        cache_dir="/tmp/stroke_tpu_synth_cache" if xyoriginal == 256
        else None)
    if config == "unet":
        return StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                               [LABEL_CORE, LABEL_PENU], resample=0.5,
                               flip_split_id=15, pad=(20, 20, 20))
    return StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                           [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                           resample=0.5, flip_split_id=15, pad=None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=["unet", "cae"], required=True)
    p.add_argument("--epochs", type=int, default=35)
    p.add_argument("--fold", type=int, nargs="+", default=list(range(29)))
    p.add_argument("--validsetsize", type=float, default=0.275)
    p.add_argument("--seed", type=int, default=4)
    p.add_argument("--batchsize", type=int, default=None)
    p.add_argument("--channels", type=int, nargs="+",
                   default=[2, 16, 32, 64, 32, 16, 32, 2])
    p.add_argument("--channelscae", type=int, nargs="+",
                   default=[1, 16, 24, 32, 100, 200, 1])
    p.add_argument("--xyoriginal", type=int, default=256)
    p.add_argument("--zsize", type=int, default=28)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--lrsteps", type=int, nargs="*", default=None,
                   help="MultiStepLR epoch milestones (gamma 0.1), the "
                        "reference's --lrsteps (util.py:54)")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax.numpy as jnp

    from stroke_prediction_tpu.data.loader import (
        get_stroke_shape_training_data)
    from stroke_prediction_tpu.train.optim import make_optimizer, multistep_lr

    sched = (multistep_lr(1e-3, args.lrsteps) if args.lrsteps else None)
    batch = args.batchsize or (6 if args.config == "unet" else 4)
    ds = build_dataset(args.config, args.seed, args.xyoriginal, args.zsize)
    dl_train, dl_valid = get_stroke_shape_training_data(
        ds, args.fold, args.validsetsize, seed=args.seed, batchsize=batch)
    print(f"jax parity {args.config}: train {len(dl_train.indices)} "
          f"valid {len(dl_valid.indices)} batch {batch}", flush=True)

    cd = jnp.dtype(args.dtype)
    outdir = os.path.dirname(os.path.abspath(args.out)) or "."
    os.makedirs(outdir, exist_ok=True)
    base = os.path.join(outdir, "ckpt_"
                        + os.path.basename(args.out).replace(".json", ""))

    if args.config == "unet":
        from stroke_prediction_tpu.models.unet3d import Unet3D
        from stroke_prediction_tpu.train.unet_learner import (
            UnetSegmentationLearner)
        model = Unet3D(channels=tuple(args.channels), compute_dtype=cd)
        tx = make_optimizer(1e-3, betas=(0.99, 0.999), weight_decay=1e-5)
        learner = UnetSegmentationLearner(
            dl_train, dl_valid, model, tx, sched, n_epochs=args.epochs,
            patch_whd=(104, 104, 68), pad_xyz=(20, 20, 20),
            path_outputs_base=base, seed=args.seed,
            metrics_with_distances=False, log_throughput=True)
    else:
        from stroke_prediction_tpu.models.cae3d import (
            Cae3D, Dec3D, Enc3D)
        from stroke_prediction_tpu.train.cae_learners import (
            CaeReconstructionLearner)
        ch = tuple(args.channelscae)
        cae = Cae3D(enc=Enc3D(channels=ch, compute_dtype=cd),
                    dec=Dec3D(channels=ch, compute_dtype=cd))
        tx = make_optimizer(1e-3, betas=(0.9, 0.999), weight_decay=1e-5)
        learner = CaeReconstructionLearner(
            dl_train, dl_valid, cae, tx, sched, n_epochs=args.epochs,
            base_betas=(0.9, 0.999), path_outputs_base=base,
            seed=args.seed, metrics_with_distances=False,
            log_throughput=True)

    learner.run_training()
    with open(args.out, "w") as f:
        json.dump(learner._metric_dtos, f)
    print("PARITY_JAX_DONE")


if __name__ == "__main__":
    main()

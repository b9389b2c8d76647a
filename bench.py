"""Benchmark: training throughput (volumes/sec/chip) on TPU versus the
PyTorch-CPU reference equivalent, for BOTH headline configs:

  * 3-D U-Net at the config of record — channels
    (2, 16, 32, 64, 32, 16, 32, 2), batch 6, random 104x104x68 patches,
    Dice loss, Adam (the primary metric; BASELINE.json config #1).  Our
    step includes the on-device random-patch augmentation; the torch
    baseline includes only forward+backward+step.
  * CAE shape reconstruction at the config of record — channels
    (1, 16, 24, 32, 100, 200, 1), batch 4, 28x128x128 masks, curriculum
    Dice+hinge loss (BASELINE.json config #2; the flagship model),
    reported as extra keys on the same line.

Prints a JSON line after EVERY completed leg (each a superset of the
last — a budget-killed run still leaves the finished legs parseable);
ONE final combined line carries all four legs plus telemetry:
  {"metric": ..., "value": N, "unit": "volumes/sec/chip", "vs_baseline": N,
   "cae_value": N, ..., "infer_value": N, ..., "learner_value": N, ...,
   "skipped": [], "legs_elapsed_s": {...}, "legs_compile_s": {...}}
Wall-clock budget: BENCH_BUDGET_S (default 1200 s) — a low budget runs
reduced-steps leg variants; only a nearly-exhausted one (<25 s) skips.

The torch-CPU baselines are measured once and cached in
BASELINE_MEASURED.json (delete the file to re-measure).
"""

from __future__ import annotations

import json
import os
import time

# Repo-local persistent compile cache: the driver's bench container has a
# cold /tmp but shares the repo mount, so builder-warmed XLA compiles are
# reused there (round-4 lesson: a cold cache cost ~26 min of recompiles
# and starved 3 of 4 legs).  Pre-warmed in-round; gitignored.  NB the
# axon sitecustomize imports jax at interpreter startup — BEFORE this
# module runs — so the env var alone is captured too late and the cache
# dir must be installed via config.update at runtime.
_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    except Exception:                                # noqa: BLE001
        pass

BATCH = int(os.environ.get("BENCH_BATCH", "6"))
PATCH = (104, 104, 68)          # W, H, D
PAD = (20, 20, 20)
VOL = (68, 168, 168)            # D, H, W padded full volume
CHANNELS = (2, 16, 32, 64, 32, 16, 32, 2)
COMPUTE_DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")


def measure_tpu(steps: int = 20) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stroke_prediction_tpu.data.augment import random_patch
    from stroke_prediction_tpu.eval.metrics import batch_dice_loss
    from stroke_prediction_tpu.models.unet3d import Unet3D
    from stroke_prediction_tpu.train.learner import TrainState
    from stroke_prediction_tpu.train.optim import make_optimizer

    model = Unet3D(channels=CHANNELS,
                   compute_dtype=jnp.dtype(COMPUTE_DTYPE))
    tx = make_optimizer(1e-3, betas=(0.99, 0.999), weight_decay=1e-5)

    d, h, w = VOL
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, d, h, w, 2), jnp.float32)
    labels = jnp.asarray(
        (rng.rand(BATCH, d - 2 * PAD[2], h - 2 * PAD[1], w - 2 * PAD[0], 2)
         > 0.7), jnp.float32)

    pd, ph, pw = PATCH[2], PATCH[1], PATCH[0]
    # jitted init: unjitted flax init executes op-by-op — hundreds of
    # individual RPCs over the tunneled TPU (measured ~minutes/leg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((2, pd, ph, pw, 2)))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state, images, labels, key):
        imgs, labs = random_patch(key, images, labels, PATCH, PAD)

        def loss_fn(params):
            seg, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"])
            loss = (batch_dice_loss(seg[..., 0:1], labs[..., 0:1])
                    + batch_dice_loss(seg[..., 1:2], labs[..., 1:2])) / 2
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=mut["batch_stats"],
                             step=state.step + 1), loss

    keys = jax.random.split(jax.random.PRNGKey(1), 2 * steps + 4)
    # warmup / compile; the float() fetch forces real execution (the axon
    # tunnel defers work past block_until_ready, so timings must be
    # anchored on host materialization)
    tc = time.perf_counter()
    state, loss = train_step(state, images, labels, keys[0])
    _ = float(loss)
    compile_s = time.perf_counter() - tc
    state, loss = train_step(state, images, labels, keys[1])
    _ = float(loss)

    def timed(n, key_off):
        s = state
        t0 = time.perf_counter()
        for i in range(n):
            s, l = train_step(s, images, labels, keys[key_off + i])
        _ = float(l)
        return time.perf_counter() - t0

    t1 = timed(1, 2)
    tn = timed(steps + 1, 3)
    dt = max(tn - t1, 1e-9) / steps
    return BATCH / dt, compile_s


CHANNELS_CAE = (1, 16, 24, 32, 100, 200, 1)
BATCH_CAE = int(os.environ.get("BENCH_BATCH_CAE", "4"))
VOL_CAE = (28, 128, 128)        # D, H, W


def measure_tpu_cae(steps: int = 10) -> float:
    """CAE reconstruction train step (encoder x3 + decoder x4 per step,
    reference common/model/Cae3D.py:39-239) at the config of record."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stroke_prediction_tpu.core.dto import BRANCH_GTRUTH
    from stroke_prediction_tpu.eval.metrics import (
        batch_dice_loss, monotonicity_hinge)
    from stroke_prediction_tpu.inference import cae_dto_from_batch
    from stroke_prediction_tpu.models.cae3d import Cae3D, Dec3D, Enc3D
    from stroke_prediction_tpu.train.learner import TrainState
    from stroke_prediction_tpu.train.optim import make_optimizer

    cd = jnp.dtype(COMPUTE_DTYPE)
    cae = Cae3D(enc=Enc3D(channels=CHANNELS_CAE, compute_dtype=cd),
                dec=Dec3D(channels=CHANNELS_CAE, compute_dtype=cd))
    tx = make_optimizer(1e-3, betas=(0.9, 0.999), weight_decay=1e-5)

    d, h, w = VOL_CAE
    rng = np.random.RandomState(0)
    labels = jnp.asarray((rng.rand(BATCH_CAE, d, h, w, 3) > 0.7),
                         jnp.float32)
    clin = jnp.asarray(rng.rand(BATCH_CAE, 5), jnp.float32)
    dto = cae_dto_from_batch(None, labels, clin)
    variables = jax.jit(
        lambda k, d: cae.init(k, d, BRANCH_GTRUTH, False))(
            jax.random.PRNGKey(0), dto)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state, labels, clin):
        dto = cae_dto_from_batch(None, labels, clin)

        def loss_fn(params):
            out, mut = cae.apply(
                {"params": params, "batch_stats": state.batch_stats},
                dto, BRANCH_GTRUTH, True, mutable=["batch_stats"])
            rec = out.reconstructions.gtruth
            gt = out.given_variables.gtruth
            loss = (monotonicity_hinge(rec.penu - rec.interpolation)
                    + monotonicity_hinge(rec.penu - rec.core)
                    + batch_dice_loss(rec.core, gt.core)
                    + batch_dice_loss(rec.penu, gt.penu)
                    + batch_dice_loss(rec.lesion, gt.lesion)) / 5.0
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=mut["batch_stats"],
                             step=state.step + 1), loss

    tc = time.perf_counter()
    state, loss = train_step(state, labels, clin)
    _ = float(loss)
    compile_s = time.perf_counter() - tc
    state, loss = train_step(state, labels, clin)
    _ = float(loss)
    t0 = time.perf_counter()
    for _i in range(steps):
        state, loss = train_step(state, labels, clin)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / steps
    return BATCH_CAE / dt, compile_s


def measure_tpu_infer(steps: int = 30) -> float:
    """Full-volume batch-1 eval-mode U-Net forward — the tester's
    fully-convolutional inference semantics (reference
    test_unet_segmentation.py runs whole volumes, batch 1; our
    eval/tester.py asserts batch 1).  The north-star metric is
    volumes/sec/chip train+INFER (BASELINE.json:2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stroke_prediction_tpu.models.unet3d import Unet3D

    model = Unet3D(channels=CHANNELS,
                   compute_dtype=jnp.dtype(COMPUTE_DTYPE))
    d, h, w = VOL
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, d, h, w, 2), jnp.float32)
    variables = jax.jit(lambda k, z: model.init(k, z, train=False))(
        jax.random.PRNGKey(0),
        jnp.zeros((2, PATCH[2], PATCH[1], PATCH[0], 2)))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    tc = time.perf_counter()
    out = fwd(variables, x)
    _ = float(jnp.sum(out))
    compile_s = time.perf_counter() - tc
    out = fwd(variables, x)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _i in range(steps):
        out = fwd(variables, x)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / steps
    return 1.0 / dt, compile_s


def measure_torch_cpu_infer_baseline(steps: int = 2) -> float:
    """Reference-equivalent PyTorch-CPU full-volume batch-1 U-Net
    forward (no_grad eval), matching measure_tpu_infer."""
    import torch

    net = _torch_unet()
    net.eval()
    d, h, w = VOL
    x = torch.rand(1, 2, d, h, w)
    with torch.no_grad():
        net(x)                    # warmup
        t0 = time.perf_counter()
        for _ in range(steps):
            net(x)
    dt = (time.perf_counter() - t0) / steps
    return 1.0 / dt


def measure_learner(epochs: int = 6) -> float:
    """End-to-end throughput of the REAL UnetSegmentationLearner epoch
    loop (device-resident dataset, in-graph batch gather, one metrics
    fetch per epoch) at the config of record on the synthetic 29-case
    dataset — the honest train-loop number, not a data-resident step
    microbenchmark.  Matches the reference's whole per-epoch loop
    (learner/Learner.py:163-226)."""
    import jax.numpy as jnp

    from stroke_prediction_tpu.data.dataset import (
        LABEL_CORE, LABEL_PENU, MOD_CBV, MOD_TTD, StrokeDataset3D,
        SyntheticCaseProvider)
    from stroke_prediction_tpu.data.loader import (
        get_stroke_shape_training_data)
    from stroke_prediction_tpu.models.unet3d import Unet3D
    from stroke_prediction_tpu.train.optim import make_optimizer
    from stroke_prediction_tpu.train.unet_learner import (
        UnetSegmentationLearner)

    provider = SyntheticCaseProvider(
        n_cases=29, shape_xyz=(256, 256, 28), seed=4,
        cache_dir="/tmp/stroke_tpu_synth_cache")
    ds = StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                         [LABEL_CORE, LABEL_PENU], resample=0.5,
                         flip_split_id=15, pad=PAD)
    train, valid = get_stroke_shape_training_data(
        ds, range(20), 0.275, seed=4, batchsize=BATCH)
    learner = UnetSegmentationLearner(
        train, valid,
        Unet3D(channels=CHANNELS, compute_dtype=jnp.dtype(COMPUTE_DTYPE)),
        make_optimizer(1e-3, betas=(0.99, 0.999), weight_decay=1e-5),
        None, n_epochs=epochs, patch_whd=PATCH, pad_xyz=PAD,
        path_outputs_base="/tmp/bench_learner", seed=4,
        metrics_with_distances=False, log_throughput=True)
    learner.run_training()
    return learner._timer.volumes_per_sec_per_chip, None


def measure_torch_cpu_cae_baseline(steps: int = 1) -> float:
    """Reference-equivalent PyTorch-CPU CAE train step (same arch as the
    parity trainer, batch 1 scaled)."""
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    import torch

    from parity_torch import TorchDec3D, TorchEnc3D, dice_loss, hinge

    torch.manual_seed(0)
    enc = TorchEnc3D(CHANNELS_CAE)
    dec = TorchDec3D(CHANNELS_CAE)
    params = list(enc.parameters()) + list(dec.parameters())
    opt = torch.optim.Adam(params, lr=1e-3, weight_decay=1e-5,
                           betas=(0.9, 0.999))
    d, h, w = VOL_CAE
    labels = (torch.rand(1, 3, d, h, w) > 0.7).float()
    t = torch.rand(1, 1, 1, 1, 1) * 0.5

    def step():
        opt.zero_grad()
        zc = enc(labels[:, 0:1])
        zp = enc(labels[:, 1:2])
        zl = enc(labels[:, 2:3])
        zi = zc + t * (zp - zc)
        rc, rp, rl, ri = dec(zc), dec(zp), dec(zl), dec(zi)
        loss = (hinge(rp - ri) + hinge(rp - rc)
                + dice_loss(rc, labels[:, 0:1])
                + dice_loss(rp, labels[:, 1:2])
                + dice_loss(rl, labels[:, 2:3])) / 5.0
        loss.backward()
        opt.step()

    step()                       # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return 1.0 / dt              # volumes/sec on CPU


def _torch_unet():
    """Reference-equivalent torch U-Net at the config of record (shared
    by the train-step and inference baselines)."""
    import torch
    import torch.nn as nn

    cin, b1, b2, b3, b4, b5, bc, ncls = CHANNELS

    def block(ci, co):
        return nn.Sequential(
            nn.BatchNorm3d(ci), nn.Conv3d(ci, co, 3), nn.LeakyReLU(0.01, True),
            nn.BatchNorm3d(co), nn.Conv3d(co, co, 3), nn.LeakyReLU(0.01, True))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.b1 = block(cin, b1)
            self.b2 = block(b1, b2)
            self.b3 = block(b2, b3)
            self.b4 = block(b3 + b2, b4)
            self.b5 = block(b4 + b1, b5)
            self.pool = nn.MaxPool3d(2, 2)
            self.up = nn.Upsample(scale_factor=2, mode="trilinear")
            self.head = nn.Sequential(nn.Conv3d(b5, bc, 1),
                                      nn.LeakyReLU(0.01, True),
                                      nn.Conv3d(bc, ncls, 1), nn.Sigmoid())

        def forward(self, x):
            def crop_to(t, like):
                ds = [(t.shape[i] - like.shape[i]) // 2 for i in (2, 3, 4)]
                return t[:, :, ds[0]:ds[0] + like.shape[2],
                         ds[1]:ds[1] + like.shape[3],
                         ds[2]:ds[2] + like.shape[4]]

            r1 = self.b1(x)
            r2 = self.b2(self.pool(r1))
            r3 = self.b3(self.pool(r2))
            u = self.up(r3)
            r4 = self.b4(torch.cat([u, crop_to(r2, u)], 1))
            u = self.up(r4)
            r5 = self.b5(torch.cat([u, crop_to(r1, u)], 1))
            return self.head(r5)

    torch.manual_seed(0)
    return Net()


def measure_torch_cpu_baseline(steps: int = 1) -> float:
    """Reference-equivalent PyTorch-CPU U-Net train step (same arch,
    batch 1 scaled: CPU time is linear in batch)."""
    import torch

    net = _torch_unet()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, weight_decay=1e-5,
                           betas=(0.99, 0.999))
    bs = 1
    x = torch.rand(bs, 2, PATCH[2], PATCH[1], PATCH[0])
    y = (torch.rand(bs, 2, PATCH[2] - 2 * PAD[2], PATCH[1] - 2 * PAD[1],
                    PATCH[0] - 2 * PAD[0]) > 0.7).float()

    def dice_loss(o, t):
        inter = (o * t).sum()
        return 1 - (2 * inter + 1e-7) / ((o * o).sum() + (t * t).sum() + 1e-7)

    def step():
        opt.zero_grad()
        out = net(x)
        loss = (dice_loss(out[:, 0], y[:, 0])
                + dice_loss(out[:, 1], y[:, 1])) / 2
        loss.backward()
        opt.step()

    step()                       # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return bs / dt               # volumes/sec on CPU


def get_baselines() -> dict:
    data = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            data = json.load(f)
    changed = False
    if "torch_cpu_volumes_per_sec" not in data:
        data["torch_cpu_volumes_per_sec"] = measure_torch_cpu_baseline()
        data["config"] = {"channels": list(CHANNELS), "patch": PATCH,
                          "batch_scaling": "measured bs=1, linear"}
        changed = True
    if "torch_cpu_cae_volumes_per_sec" not in data:
        data["torch_cpu_cae_volumes_per_sec"] = \
            measure_torch_cpu_cae_baseline()
        data["config_cae"] = {"channels": list(CHANNELS_CAE),
                              "volume": VOL_CAE,
                              "batch_scaling": "measured bs=1, linear"}
        changed = True
    if "torch_cpu_infer_volumes_per_sec" not in data:
        data["torch_cpu_infer_volumes_per_sec"] = \
            measure_torch_cpu_infer_baseline()
        data["config_infer"] = {"channels": list(CHANNELS), "volume": VOL,
                                "batch": 1, "mode": "eval/no_grad"}
        changed = True
    if changed:
        with open(BASELINE_FILE, "w") as f:
            json.dump(data, f)
    return data


def main():
    """Driver-proof schedule: a JSON line with every key gathered so far
    is printed IMMEDIATELY after each leg completes (a driver that kills
    the process mid-run still harvests the finished legs from the last
    parseable line), and ONE final combined line carries all legs plus an
    explicit ``skipped`` list and per-leg elapsed/compile telemetry.
    Wall-clock budget (BENCH_BUDGET_S, default 20 min): when the budget
    runs low a leg runs a reduced-steps variant instead of being skipped
    outright; only a nearly-exhausted budget (<25 s) skips.  Leg order:
    cheap-compile legs (infer, cae) before the U-Net step and the
    end-to-end Learner leg, so one slow compile cannot starve the rest."""
    t_start = time.monotonic()
    _enable_compile_cache()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    out = {"metric": "unet3d_train_volumes_per_sec_per_chip",
           "value": None, "unit": "volumes/sec/chip", "vs_baseline": None}
    skipped = []
    elapsed = {}
    compile_s = {}

    base = get_baselines()

    def leg(fn_full, fn_fast, key, base_key, fast_below=240.0):
        left = budget - (time.monotonic() - t_start)
        if left <= 25:
            skipped.append(key)
            print(json.dumps(dict(out, skipped=key, budget_left_s=round(
                left, 1))), flush=True)
            return
        fn = fn_fast if left < fast_below else fn_full
        t0 = time.monotonic()
        try:
            v, comp = fn()
        except Exception as e:                      # noqa: BLE001
            skipped.append(key)
            print(json.dumps(dict(out, error=f"{key}: {e!r}")), flush=True)
            return
        elapsed[key] = round(time.monotonic() - t0, 1)
        if comp is not None:
            compile_s[key] = round(comp, 1)
        out[key] = round(v, 3)
        out[key.replace("value", "vs_baseline")] = round(v / base[base_key], 2)
        print(json.dumps(out), flush=True)

    # BENCH_LEGS (comma list of unet,cae,infer,learner; default all)
    # selects legs — e.g. BENCH_LEGS=learner re-measures one leg after
    # a Learner change without paying the other three.
    want = set(os.environ.get("BENCH_LEGS", "unet,cae,infer,learner")
               .split(","))
    # full-volume batch-1 eval-mode inference (the tester semantics) —
    # cheapest compile, runs first
    if "infer" in want:
        leg(measure_tpu_infer, lambda: measure_tpu_infer(steps=8),
            "infer_value", "torch_cpu_infer_volumes_per_sec")
    # flagship model: CAE reconstruction train step
    if "cae" in want:
        leg(measure_tpu_cae, lambda: measure_tpu_cae(steps=4),
            "cae_value", "torch_cpu_cae_volumes_per_sec")
    # primary metric: U-Net train step at the config of record
    if "unet" in want:
        leg(measure_tpu, lambda: measure_tpu(steps=5),
            "value", "torch_cpu_volumes_per_sec")
    # end-to-end Learner epoch-loop throughput (not a step microbench)
    if "learner" in want:
        leg(lambda: measure_learner(epochs=4),
            lambda: measure_learner(epochs=2),
            "learner_value", "torch_cpu_volumes_per_sec", fast_below=300.0)

    # the single final combined line the driver parses (last parseable
    # line wins): explicit skipped list + per-leg telemetry
    print(json.dumps(dict(
        out, skipped=skipped, legs_elapsed_s=elapsed,
        legs_compile_s=compile_s,
        budget_left_s=round(budget - (time.monotonic() - t_start), 1))),
        flush=True)


if __name__ == "__main__":
    main()

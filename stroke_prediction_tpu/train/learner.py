"""The training engine.

Behavioral redesign of the reference Learner (learner/Learner.py:16-226):
the same epoch protocol — adapt lr/betas → train pass → validation pass →
save-on-new-validation-minimum (+ training-state snapshot for resume) →
periodic visualization every 50 epochs → per-epoch loss-curve plot → final
model save — but the per-batch work is a single jit-compiled device step:
on-device augmentation, forward, loss, backward, optax update, and
in-graph metrics.  The host loop only schedules epochs, moves batches, and
writes artifacts.

Subclasses provide the jitted step builders and the loss/metric recipes —
four learners share this engine, as in the reference
(UnetSegmentation / CaeReconstruction / CaeStep / CaePrediction).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.data.dataset import (
    KEY_CASE_ID, KEY_GLOBAL, KEY_IMAGES, KEY_LABELS)
from stroke_prediction_tpu.train import checkpoint as ckpt
from stroke_prediction_tpu.train.optim import set_hyperparams


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class Learner:
    """Base class with the standard training routine
    (reference: learner/Learner.py:16-226)."""

    # filename contract (reference: Learner.py:22-31)
    FNB_MARKS = "_learner"
    FN_VIS_BASE = "_visual_"
    EXT_MODEL = ".model"
    EXT_OPTIM = ".optim"
    EXT_TRAIN = ".json"
    EXT_IMAGE = ".png"

    N_EPOCHS_ADAPT_BETA1 = None    # set by CAE learners

    def __init__(self, dataloader_training, dataloader_validation, model,
                 optimizer, lr_schedule, n_epochs: int,
                 path_previous_base: Optional[str] = None,
                 path_outputs_base: str = "/tmp/stroke-prediction",
                 seed: int = 4, metrics_with_distances: bool = True,
                 mesh=None, log_throughput: bool = False,
                 profile_dir: Optional[str] = None,
                 device_cache: Optional[bool] = None):
        assert dataloader_training.batch_size > 1, \
            "For normalization layers batch_size > 1 is required."
        self._dataloader_training = dataloader_training
        self._dataloader_validation = dataloader_validation
        self._model = model
        self._tx = optimizer
        self._lr_schedule = lr_schedule
        self._n_epochs = n_epochs
        self._path_outputs_base = path_outputs_base
        self._path_previous_base = path_previous_base
        # distances mode: True = HD/ASSD in every train+validation batch
        # (full reference parity, slow compiles), "validation" = distances
        # on validation batches only (reference-shaped per-epoch ASSD
        # curves at a fraction of the cost — the default from the CLI),
        # False = never (inf placeholders)
        self._distances_mode = metrics_with_distances
        self._metrics_phase = "train"
        self._mesh = mesh
        self._key = jax.random.PRNGKey(seed)
        from stroke_prediction_tpu.utils.profiling import StepTimer
        n_chips = mesh.size if mesh is not None else 1
        # epoch-level timing: the first training pass is compile-dominated
        self._timer = StepTimer(warmup_steps=1, n_chips=n_chips)
        self._log_throughput = log_throughput
        self._profile_dir = profile_dir
        # Device-resident dataset: the preprocessed cases live in HBM once
        # and per-epoch batches are in-graph gathers by permuted row index
        # (the reference re-stacks volumes on the host every step,
        # common/data.py DataLoader).  Default on for single-process runs;
        # multi-host keeps the process-sharded host loader.
        if device_cache is None:
            device_cache = os.environ.get(
                "STROKE_TPU_DEVICE_CACHE", "1") != "0"
        self._device_cache = device_cache
        self._dev_data: Dict[Any, tuple] = {}
        # per-loader epoch plans for the device-resident path: every
        # epoch's row permutation and loss factor, device-put ONCE at
        # first use, indexed in-graph by epoch counter (_make_plan)
        self._plans: Dict[str, dict] = {}

        self._state: Optional[TrainState] = None
        self._train_step = None
        self._eval_step = None
        self._train_step_rows = None
        self._eval_step_rows = None
        self._metric_dtos: Dict[str, List[dict]] = {"training": [],
                                                    "validate": []}

        self._build()   # subclass: init state + jitted steps

        if path_previous_base is not None:
            self.load_model()
            self.load_training()
            print("Continue training", path_previous_base, "...")
        assert len(self._metric_dtos["training"]) == len(
            self._metric_dtos["validate"]), "Incomplete training data!"

    # ---------------------------------------------------------------- paths

    def path(self, mode: str, type_: str, suffix: str = "") -> Optional[str]:
        """reference: Learner.py:59-78."""
        base = {"load": self._path_previous_base,
                "save": self._path_outputs_base}.get(mode)
        if base is None:
            return None
        ext = {"model": self.EXT_MODEL, "optim": self.EXT_OPTIM,
               "train": self.EXT_TRAIN, "plots": self.EXT_IMAGE,
               "image": self.EXT_IMAGE}.get(type_)
        if ext is None:
            return None
        return base + self.FNB_MARKS + suffix + ext

    @property
    def _with_distances(self) -> bool:
        """Whether the metric recipe being traced right now includes
        HD/ASSD.  Read by the subclasses' ``_metrics`` at trace time of
        each step variant; ``_metrics_phase`` is set by the step wrappers
        in :meth:`_install_steps`."""
        if self._distances_mode == "validation":
            return self._metrics_phase == "eval"
        return bool(self._distances_mode)

    # ------------------------------------------------------- subclass hooks

    def _build(self):
        raise NotImplementedError

    def _install_steps(self, train_fn, eval_fn):
        """Wrap the subclass's pure step functions.

        The host-batch steps (multi-host / prefetch path) are jitted
        here; the device-resident dataset path builds per-loader EPOCH
        functions from the same raw steps (:meth:`_build_epoch_fn`), in
        which the batch is assembled in-graph from the HBM-cached case
        arrays by row index — no host stacking or host->device transfer
        per batch, and one dispatch per epoch phase.
        """

        def _phased(fn, phase):
            def wrapped(*a, **kw):
                self._metrics_phase = phase   # read at trace time only
                return fn(*a, **kw)
            return wrapped

        self._train_fn_raw = _phased(train_fn, "train")
        self._eval_fn_raw = _phased(eval_fn, "eval")
        self._train_step = jax.jit(self._train_fn_raw, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_fn_raw)

        mesh = self._mesh

        def gather(data, rows):
            batch = {}
            for k, v in data.items():
                if v is None:
                    batch[k] = None
                    continue
                g = v[rows]
                if (mesh is not None
                        and g.shape[0] % mesh.shape["data"] == 0):
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    g = jax.lax.with_sharding_constraint(
                        g, NamedSharding(mesh, P("data")))
                batch[k] = g
            return batch

        self._gather = gather

    def _build_epoch_fn(self, training: bool, n_groups: int):
        """One jitted WHOLE-EPOCH function: scans every chunk group of
        the epoch and returns the metric leaves packed into a single
        flat f32 vector, so an epoch phase is ONE dispatch + ONE
        device->host fetch (2 tunnel round trips — round-4 measured the
        per-epoch fixed cost at ~4 round trips with per-group dispatch
        and a separate packing call; on the tunneled TPU each jitted
        call and each fetch is an RPC).

        The in-scan key split reproduces the host loop's key sequence
        exactly (``self._key, sub = split(self._key)`` per step), so
        curves are bit-identical to the host path.  The row permutation
        and curriculum factor for every epoch live on device
        (:meth:`_make_plan`) and are indexed in-graph by the epoch
        counter — no per-epoch host->device staging at all.

        Returns ``(fn, layout)``: ``layout`` is filled at trace time
        with the packed vector's (group, metric key, shape) slices.
        """
        import functools

        step_fn = self._train_fn_raw if training else self._eval_fn_raw
        gather = self._gather
        layout: List[tuple] = []

        def run_epoch(state, data, rows_groups, factors, e, key):
            factor = factors[e]
            packed = []
            for g in range(n_groups):
                rows = rows_groups[g][e]
                if training:
                    def body(carry, r):
                        st, k = carry
                        k, sub = jax.random.split(k)
                        st, m = step_fn(st, gather(data, r), sub, factor)
                        return (st, k), m
                    (state, key), metrics = jax.lax.scan(
                        body, (state, key), rows)
                else:
                    def body(k, r):
                        k, sub = jax.random.split(k)
                        m = step_fn(state, gather(data, r), sub, factor)
                        return k, m
                    key, metrics = jax.lax.scan(body, key, rows)
                for name in sorted(metrics):
                    v = metrics[name]
                    if not any(lay[:2] == (g, name) for lay in layout):
                        layout.append((g, name, tuple(v.shape)))
                    packed.append(jnp.asarray(v, jnp.float32).reshape(-1))
            flat = packed[0] if len(packed) == 1 else jnp.concatenate(packed)
            return state, key, flat

        if training:
            fn = functools.partial(jax.jit, donate_argnums=(0,))(run_epoch)
        else:
            def eval_epoch(state, data, rows_groups, factors, e, key):
                _, key, flat = run_epoch(state, data, rows_groups,
                                         factors, e, key)
                return key, flat
            fn = jax.jit(eval_epoch)
        return fn, layout

    def _device_data(self, loader):
        """HBM-resident (N, ...) case arrays for a loader's subset, built
        once; returns (arrays, dataset-index -> row map)."""
        key = (id(loader.dataset), tuple(loader.indices))
        entry = self._dev_data.get(key)
        if entry is None:
            stack = loader.dataset.stack(loader.indices)
            data = {}
            for k in (KEY_IMAGES, KEY_LABELS, KEY_GLOBAL):
                v = stack.get(k)
                if v is None:
                    data[k] = None
                elif self._mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    data[k] = jax.device_put(
                        jnp.asarray(v), NamedSharding(self._mesh, P()))
                else:
                    data[k] = jax.device_put(jnp.asarray(v))
            rowmap = {idx: row for row, idx in enumerate(loader.indices)}
            entry = (data, rowmap)
            self._dev_data[key] = entry
        return entry

    def _resolve_tx(self, params):
        """The optimizer argument may be a ready GradientTransformation or
        a ``params -> tx`` factory (used when a trainable mask depends on
        the parameter structure, e.g. step-head-only training)."""
        if not hasattr(self._tx, "init"):
            self._tx = self._tx(params)
        return self._tx

    def model_config(self) -> Dict[str, Any]:
        """Model hyperparameters stored in the checkpoint header."""
        return {}

    def print_epoch(self, epoch, phase, m: dict):
        pass

    def plot_epoch(self, plot, epochs):
        pass

    def visualize_epoch(self, epoch):
        pass

    def batch_to_device(self, batch):
        """Host batch dict -> device arrays (optionally sharded).

        Multi-host: when more than one JAX process participates, the
        incoming batch is this host's process-local shard (the loader's
        ``process_shard``); the global array is assembled across hosts
        without any host holding the full batch."""
        if self._mesh is not None and jax.process_count() > 1:
            from stroke_prediction_tpu.parallel.distributed import (
                global_batch)
            out = global_batch(
                self._mesh,
                {k: batch.get(k) for k in (KEY_IMAGES, KEY_LABELS,
                                           KEY_GLOBAL)})
            out[KEY_CASE_ID] = batch.get(KEY_CASE_ID)
            return out
        out = {}
        for k in (KEY_IMAGES, KEY_LABELS, KEY_GLOBAL):
            v = batch.get(k)
            if v is None:
                out[k] = None
                continue
            arr = jnp.asarray(v)
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                spec = P("data") if arr.shape[0] % self._mesh.shape["data"] == 0 \
                    else P()
                arr = jax.device_put(arr, NamedSharding(self._mesh, spec))
            out[k] = arr
        out[KEY_CASE_ID] = batch.get(KEY_CASE_ID)
        return out

    # ------------------------------------------------------------ schedules

    def adapt_lr(self, epoch):
        """reference: Learner.py:156-158 (MultiStepLR step at epoch start)."""
        if self._lr_schedule is not None:
            lr = self._lr_schedule(epoch)
            self._state = self._state.replace(
                opt_state=set_hyperparams(self._state.opt_state,
                                          learning_rate=lr))

    def adapt_betas(self, epoch):
        """β₁ warm-ramp (reference: CaeReconstructionLearner.py:28-40);
        no-op unless N_EPOCHS_ADAPT_BETA1 is set."""
        if self.N_EPOCHS_ADAPT_BETA1 is None:
            return
        from stroke_prediction_tpu.train.optim import beta1_ramp
        b1 = beta1_ramp(self._base_b1, epoch, self.N_EPOCHS_ADAPT_BETA1)
        self._state = self._state.replace(
            opt_state=set_hyperparams(self._state.opt_state, b1=b1))
        if epoch <= self.N_EPOCHS_ADAPT_BETA1:
            print("Momentum betas have been set to:", (b1, self._base_b2),
                  end=" ")

    def loss_factor(self, epoch: int) -> float:
        """Curriculum weight for epoch-dependent loss terms (subclasses)."""
        return 0.0

    # --------------------------------------------------------- resume hooks

    def get_start_epoch(self) -> int:
        return len(self._metric_dtos["training"])

    def get_start_min_loss(self) -> float:
        losses = [m["loss"] for m in self._metric_dtos["validate"]
                  if m.get("loss") is not None]
        return min(losses) if losses else np.inf

    # ------------------------------------------------------------ persist

    def _state_dict(self):
        return {"params": self._state.params,
                "batch_stats": self._state.batch_stats}

    def _vis_state(self):
        """Params/batch-stats for the lead-only visualization forwards.

        After the first mesh-jitted train step the live state is
        committed to the global (all-host) mesh; launching a lead-only
        jit from it would need a device assignment spanning
        non-addressable devices.  Multi-host therefore fetches the
        (replicated) state to host first, making the vis computation
        fully local to process 0; single-host passes the live state
        through untouched."""
        if jax.process_count() > 1:
            return (jax.device_get(self._state.params),
                    jax.device_get(self._state.batch_stats))
        return self._state.params, self._state.batch_stats

    def _is_lead(self) -> bool:
        """Multi-host: only process 0 writes artifacts (params are
        replicated, so every process holds the same state)."""
        return jax.process_index() == 0

    def save_model(self, suffix: str = ""):
        """reference: Learner.py:112-114."""
        if not self._is_lead():
            return
        ckpt.save_checkpoint(self.path("save", "model", suffix),
                             self._state_dict(), self.model_config())

    def load_model(self):
        state, _ = ckpt.load_checkpoint(self.path("load", "model"))
        self._state = self._state.replace(params=state["params"],
                                          batch_stats=state["batch_stats"])

    def save_training(self):
        """reference: Learner.py:104-110."""
        if not self._is_lead():
            return
        ckpt.save_checkpoint(self.path("save", "optim"),
                             {"opt_state": self._state.opt_state})
        ckpt.save_curves(self.path("save", "train"), self._metric_dtos)

    def load_training(self):
        path_t = self.path("load", "train")
        path_o = self.path("load", "optim")
        print("Loading:", path_t, path_o)
        opt, _ = ckpt.load_checkpoint(path_o)
        restored = jax.tree_util.tree_map(
            lambda tmpl, v: jnp.asarray(v).astype(tmpl.dtype).reshape(tmpl.shape)
            if hasattr(tmpl, "shape") else v,
            self._state.opt_state,
            _tree_like(self._state.opt_state, opt["opt_state"]))
        self._state = self._state.replace(opt_state=restored)
        self._metric_dtos = ckpt.load_curves(path_t)

    # ------------------------------------------------------------- the loop

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # Epoch-block length for the device-resident plan.  The jitted
    # epoch fn indexes (PLAN_BLOCK, n_chunks, size) row arrays, so its
    # HLO — and therefore its persistent-compile-cache key — depends
    # only on the loader's chunk structure, NOT on the run's epoch
    # count: a 4-epoch bench run, a 2-epoch reduced leg and a 300-epoch
    # CLI run all share one compiled executable.
    PLAN_BLOCK = 8

    def _make_plan(self, loader, epoch0: int) -> dict:
        """The whole run's device inputs for one loader, built ONCE at
        first use: every remaining epoch's row permutation (consuming
        the loader RNG strictly in epoch order — identical visiting
        order to the per-epoch host ``__iter__`` path) stacked into
        per-group ``(PLAN_BLOCK, n_chunks, size)`` device arrays per
        epoch block, plus the per-epoch curriculum factors.  Epochs then
        index these arrays in-graph: the timed train window holds no
        host->device staging at all (round-4 measured ~4 tunnel round
        trips/epoch of fixed cost from per-epoch rows/factor pushes and
        per-group dispatches)."""
        _, rowmap = self._device_data(loader)
        n_epochs = self._n_epochs - epoch0
        per_epoch = [loader.epoch_chunks() for _ in range(n_epochs)]
        sizes0 = [len(c) for c in per_epoch[0]]
        assert all([len(c) for c in ch] == sizes0 for ch in per_epoch), \
            "epoch chunk structure must be epoch-invariant"
        # consecutive equal-sized chunks form one scan group (typically
        # the whole epoch + at most one ragged tail)
        bounds = []
        i = 0
        while i < len(sizes0):
            j = i
            while j < len(sizes0) and sizes0[j] == sizes0[i]:
                j += 1
            bounds.append((i, j, sizes0[i]))
            i = j
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def put(a):
                return jax.device_put(a, NamedSharding(self._mesh, P()))
        else:
            put = jax.device_put
        K = self.PLAN_BLOCK
        # pad the final block to K by repeating the last epoch (those
        # slots are never indexed)
        pad = (-n_epochs) % K
        per_epoch += [per_epoch[-1]] * pad
        factors_np = [self.loss_factor(epoch0 + e) for e in range(n_epochs)]
        factors_np += [factors_np[-1]] * pad
        rows_blocks, factors_blocks = [], []
        for b0 in range(0, len(per_epoch), K):
            blk = per_epoch[b0:b0 + K]
            rows_blocks.append(tuple(
                put(jnp.asarray(
                    [[[rowmap[x] for x in c] for c in ch[i:j]]
                     for ch in blk], jnp.int32))
                for i, j, _size in bounds))
            factors_blocks.append(put(jnp.asarray(
                factors_np[b0:b0 + K], jnp.float32)))
        # per-block-slot device index scalars, staged once: passing a
        # python int to the jitted epoch fn would device_put a fresh
        # scalar inside every timed train window (a blocking transfer
        # on the tunneled TPU)
        eidx = [put(jnp.asarray(e, jnp.int32)) for e in range(K)]
        step0 = np.cumsum([0] + [j - i for i, j, _ in bounds])
        return {"epoch0": epoch0, "n_epochs": n_epochs,
                "rows_blocks": rows_blocks,
                "factors_blocks": factors_blocks, "eidx": eidx,
                "bounds": bounds, "group_step0": step0,
                "n_steps": int(step0[-1]),
                "n_vol": sum((j - i) * s for i, j, s in bounds),
                "fns": {}}

    def _get_plan(self, loader, epoch: int, training: bool):
        role = "train" if loader is self._dataloader_training else "valid"
        plan = self._plans.get(role)
        if plan is None:
            plan = self._make_plan(loader, epoch)
            self._plans[role] = plan
        if training not in plan["fns"]:
            plan["fns"][training] = self._build_epoch_fn(
                training, len(plan["bounds"]))
        return plan

    def _run_epoch(self, loader, epoch: int, training: bool) -> dict:
        from stroke_prediction_tpu.utils.profiling import annotate
        phase = "train_step" if training else "eval_step"
        use_cache = self._device_cache and jax.process_count() == 1
        results = []          # per-step metric trees, still on device
        n_vol = 0
        if training:
            # epoch-level timing, anchored on the end-of-epoch metrics
            # fetch (the axon tunnel defers execution past
            # block_until_ready, so only a host materialization is a
            # reliable fence)
            self._timer.start()
        if use_cache:
            # device-resident path: batches are gathered in-graph from
            # the HBM-cached cases by permuted row index — no host
            # stacking, no host->device transfer, no per-step host sync.
            # The whole epoch phase is ONE dispatch of a jitted epoch
            # function (every chunk group scanned, metrics packed into
            # one flat vector in-graph) + ONE device->host fetch; row
            # permutations and curriculum factors for every epoch are
            # device-resident from the start (_make_plan) and indexed
            # in-graph by the epoch counter.
            plan = self._get_plan(loader, epoch, training)
            data, _ = self._device_data(loader)
            e = epoch - plan["epoch0"]
            assert 0 <= e < plan["n_epochs"], "epoch outside the plan"
            fn, layout = plan["fns"][training]
            import time as _time
            probe = os.environ.get("STROKE_TPU_TIME_EPOCH") == "1"
            blk, slot = divmod(e, self.PLAN_BLOCK)
            rows = plan["rows_blocks"][blk]
            factors = plan["factors_blocks"][blk]
            t0 = _time.perf_counter()
            with annotate(phase):
                if training:
                    self._state, self._key, flat = fn(
                        self._state, data, rows, factors,
                        plan["eidx"][slot], self._key)
                else:
                    self._key, flat = fn(
                        self._state, data, rows, factors,
                        plan["eidx"][slot], self._key)
            t1 = _time.perf_counter()
            n_vol = plan["n_vol"]
            flat = np.asarray(jax.device_get(flat))
            if probe:
                t2 = _time.perf_counter()
                print(f"[epoch-probe] {'train' if training else 'eval'} "
                      f"dispatch {1e3 * (t1 - t0):.1f}ms "
                      f"fetch {1e3 * (t2 - t1):.1f}ms", flush=True)
            host_list = [{} for _ in range(plan["n_steps"])]
            off = 0
            for g, name, shape in layout:
                n = int(np.prod(shape))
                seg = flat[off:off + n].reshape(shape)
                off += n
                base = plan["group_step0"][g]
                for s in range(shape[0]):
                    host_list[base + s][name] = seg[s]
        else:
            factor = jnp.asarray(self.loss_factor(epoch), jnp.float32)
            # host path (multi-host / NIfTI ingest): double-buffered
            # host->HBM staging — the next batch is stacked and
            # device_put by a background thread while this step runs
            from stroke_prediction_tpu.data.prefetch import (
                prefetch_to_device)
            for batch, dev in prefetch_to_device(
                    loader, lambda b: (b, self.batch_to_device(b))):
                with annotate(phase):
                    if training:
                        self._state, metrics = self._train_step(
                            self._state, dev, self._next_key(), factor)
                    else:
                        metrics = self._eval_step(self._state, dev,
                                                  self._next_key(), factor)
                results.append(metrics)
                some = batch.get(KEY_LABELS)
                n = len(some) if some is not None \
                    else len(batch[KEY_IMAGES])
                # multi-host: the local batch is 1/process_count of the
                # global batch the chips actually processed
                n_vol += n * jax.process_count()
            # ONE bulk device->host fetch per epoch (the reference syncs
            # every batch for its numpy metrics, metrics.py:49-62).  The
            # fetch is PACKED: over the axon tunnel each pytree leaf is
            # its own round trip, so the per-epoch fixed cost scales
            # with leaf count unless the leaves are concatenated
            # in-graph into one flat array first.
            leaf_keys = [list(tree.keys()) for tree in results]
            leaves = [tree[k] for tree, ks in zip(results, leaf_keys)
                      for k in ks]
            sizes = [int(np.prod(jnp.shape(v))) for v in leaves]
            offs = np.cumsum([0] + sizes)
            if leaves:
                # the cast/flatten/concat runs as ONE jitted call
                # (cached per leaf structure): issued op-by-op it is ~27
                # separate lazy op dispatches per epoch on the tunnel
                if not hasattr(self, "_pack_jit"):
                    self._pack_jit = jax.jit(_pack_leaves)
                flat = np.asarray(
                    jax.device_get(self._pack_jit(tuple(leaves))))
            else:
                flat = np.zeros((0,), np.float32)
            host_list, li = [], 0
            for tree, ks in zip(results, leaf_keys):
                rebuilt = {}
                for k in ks:
                    seg = flat[offs[li]:offs[li + 1]]
                    rebuilt[k] = seg.reshape(jnp.shape(tree[k]))
                    li += 1
                host_list.append(rebuilt)
        if training:
            self._timer.stop(n_vol)
            if self._log_throughput:
                print(f"[throughput] {self._timer.summary()}", end=" ")
        # accumulate like MeasuresDto.add (inf propagates through +=),
        # divide like MeasuresDto.div (inf kept as-is) —
        # reference: MetricMeasuresDto.py:6-24
        accum: Dict[str, float] = {}
        for host in host_list:
            for k, v in host.items():
                accum[k] = accum.get(k, 0.0) + float(v)
        count = max(len(host_list), 1)
        return {k: (v / count if np.isfinite(v) else v)
                for k, v in accum.items()}

    def run_training(self):
        """reference: Learner.py:163-226."""
        min_loss = self.get_start_min_loss()

        epoch = self.get_start_epoch()
        for epoch in range(self.get_start_epoch(), self._n_epochs):
            self.adapt_lr(epoch)
            self.adapt_betas(epoch)

            # ------------------------------- (1) TRAINING ----------------
            # capture the SECOND epoch (first is compile-dominated), or
            # the only epoch when just one runs
            trace_epoch = min(self.get_start_epoch() + 1, self._n_epochs - 1)
            if self._profile_dir is not None and epoch == trace_epoch:
                from stroke_prediction_tpu.utils.profiling import trace
                with trace(self._profile_dir):
                    m_train = self._run_epoch(self._dataloader_training,
                                              epoch, training=True)
            else:
                m_train = self._run_epoch(self._dataloader_training, epoch,
                                          training=True)
            self.print_epoch(epoch, "training", m_train)
            self._metric_dtos["training"].append(m_train)

            # ------------------------------- (2) VALIDATE ----------------
            if self._dataloader_validation is None:
                m_valid = {"loss": 0.0}
            else:
                m_valid = self._run_epoch(self._dataloader_validation,
                                          epoch, training=False)
            self.print_epoch(epoch, "validate", m_valid)
            self._metric_dtos["validate"].append(m_valid)

            # ------------- (3) SAVE MODEL / VISUALIZE on new optimum -----
            if m_valid.get("loss") is not None and m_valid["loss"] < min_loss:
                min_loss = m_valid["loss"]
                self.save_model()
                self.save_training()
                print("(New optimum: Training saved)", end=" ")
                if self._is_lead():
                    self.visualize_epoch(epoch)

            if epoch % 50 == 0 and self._is_lead():
                self.visualize_epoch(epoch)

            # ------------- (4) PLOT / SAVE EVALUATION METRICS ------------
            if epoch > 0:
                self._plot_curves(epoch)

        # ----------------- (5) SAVE FINAL MODEL / VISUALIZE --------------
        self.save_model("_final")
        if self._is_lead():
            self.visualize_epoch(epoch)

    def _plot_curves(self, epoch):
        if not self._is_lead():
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, plot = plt.subplots()
        try:
            self.plot_epoch(plot, range(1, epoch + 2))
            fig.savefig(self._path_outputs_base + self.FN_VIS_BASE
                        + "plots.png", bbox_inches="tight", dpi=300)
        finally:
            plt.close(fig)


def _pack_leaves(leaves):
    """f32-cast, flatten and concatenate metric leaves into one vector."""
    flat = [jnp.asarray(l, jnp.float32).reshape(-1) for l in leaves]
    return flat[0] if len(flat) == 1 else jnp.concatenate(flat)


def _tree_like(template, data):
    """Restore a raw msgpack dict into the structure of ``template``."""
    from flax import serialization
    return serialization.from_state_dict(template, data)

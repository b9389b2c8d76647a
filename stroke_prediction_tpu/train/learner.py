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
                 profile_dir: Optional[str] = None):
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
        self._with_distances = metrics_with_distances
        self._mesh = mesh
        self._key = jax.random.PRNGKey(seed)
        from stroke_prediction_tpu.utils.profiling import StepTimer
        n_chips = mesh.size if mesh is not None else 1
        self._timer = StepTimer(n_chips=n_chips)
        self._log_throughput = log_throughput
        self._profile_dir = profile_dir

        self._state: Optional[TrainState] = None
        self._train_step = None
        self._eval_step = None
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

    # ------------------------------------------------------- subclass hooks

    def _build(self):
        raise NotImplementedError

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

    def _run_epoch(self, loader, epoch: int, training: bool) -> dict:
        accum: Dict[str, float] = {}
        count = 0
        factor = jnp.asarray(self.loss_factor(epoch), jnp.float32)
        from stroke_prediction_tpu.data.prefetch import prefetch_to_device
        from stroke_prediction_tpu.utils.profiling import annotate
        phase = "train_step" if training else "eval_step"
        # double-buffered host->HBM staging: the next batch is stacked
        # and device_put by a background thread while this step runs
        for batch, dev in prefetch_to_device(loader, lambda b:
                                             (b, self.batch_to_device(b))):
            with annotate(phase):
                if training:
                    self._timer.start()
                    self._state, metrics = self._train_step(
                        self._state, dev, self._next_key(), factor)
                else:
                    metrics = self._eval_step(self._state, dev,
                                              self._next_key(), factor)
            # accumulate like MeasuresDto.add (inf propagates through +=),
            # divide like MeasuresDto.div (inf kept as-is) —
            # reference: MetricMeasuresDto.py:6-24
            # (one bulk device_get per batch: it anchors the step timing on
            # host materialization — the axon tunnel requires that — and
            # avoids a device round trip per metric)
            host = {k: float(v) for k, v in
                    jax.device_get(metrics).items()}
            if training:
                some = batch.get(KEY_LABELS)
                n_vol = len(some) if some is not None \
                    else len(batch[KEY_IMAGES])
                # multi-host: the local batch is 1/process_count of the
                # global batch the chips actually processed
                self._timer.stop(n_vol * jax.process_count())
            for k, v in host.items():
                accum[k] = accum.get(k, 0.0) + v
            count += 1
        if training and self._log_throughput:
            print(f"[throughput] {self._timer.summary()}", end=" ")
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


def _tree_like(template, data):
    """Restore a raw msgpack dict into the structure of ``template``."""
    from flax import serialization
    return serialization.from_state_dict(template, data)

"""CAE learners: shape reconstruction, step learning, phase-2 prediction.

references:
  * learner/CaeReconstructionLearner.py — curriculum loss with monotonicity
    hinges, 3 Dice reconstruction terms, latent-consistency ramp
    ``factor = min(0.04*max(0, epoch-25), 1)``; Adam β₁ warm-ramp.
  * learner/CaeStepLearner.py — penumbra hinge + Dice(interp, lesion) only;
    the interpolation step comes from Enc3DStep's clinical head.
  * learner/CaePredictionLearner.py — frozen phase-1 CAE supervises a new
    encoder trained on U-Net segmentations: inputs-branch hinges +
    Dice(inputs interp, gt lesion) + 3 latent-matching L1 terms; dual
    checkpointing (main model + ``_enc`` suffix).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stroke_prediction_tpu.core.dto import (
    BRANCH_GTRUTH, BRANCH_INPUTS, CaeDto)
from stroke_prediction_tpu.data.augment import (
    elastic_deform_batch, random_hemispheric_flip)
from stroke_prediction_tpu.data.dataset import (
    KEY_GLOBAL, KEY_IMAGES, KEY_LABELS)
from stroke_prediction_tpu.eval.metrics import (
    batch_dice_loss, binary_measures, monotonicity_hinge)
from stroke_prediction_tpu.inference import (
    cae_dto_from_batch, cae_enc_inference)
from stroke_prediction_tpu.train.learner import Learner, TrainState
from stroke_prediction_tpu.train.unet_learner import _measures_dict


class CaeReconstructionLearner(Learner):
    """reference: learner/CaeReconstructionLearner.py:13-155."""

    FNB_MARKS = "_cae1"
    FN_VIS_BASE = "_cae1_"
    N_EPOCHS_ADAPT_BETA1 = 4
    LEARN_STEP = False
    AUGMENT_IMAGES = False

    def __init__(self, dataloader_training, dataloader_validation, cae_model,
                 optimizer, lr_schedule, n_epochs,
                 normalization_hours_penumbra: float = 10,
                 base_betas: Tuple[float, float] = (0.9, 0.999),
                 label_weights=(1.0,), elastic: bool = True,
                 inputs_from_images: bool = False, **kw):
        self._norm_hours = normalization_hours_penumbra
        self._base_b1, self._base_b2 = base_betas
        self._label_weights = tuple(label_weights)
        self._elastic = elastic
        self._inputs_from_images = inputs_from_images
        super().__init__(dataloader_training, dataloader_validation,
                         cae_model, optimizer, lr_schedule, n_epochs, **kw)

    def model_config(self) -> dict:
        from stroke_prediction_tpu.models.cae3d import Enc3DCtp, Enc3DStep
        # record the TRUE encoder class (not the learner's step flag):
        # `train_shape_reconstruction --steplearning` trains an Enc3DStep
        # under this learner with the time provided, and the checkpoint
        # must reload as Enc3DStep with its head params present
        cfg = {"kind": "cae3d",
               "channels": list(self._model.enc.channels),
               "n_ch_global": self._model.enc.n_ch_global,
               "step": isinstance(self._model.enc, Enc3DStep)}
        if isinstance(self._model.enc, Enc3DCtp):
            cfg["kind"] = "cae3d_ctp"
            cfg["padding"] = list(self._model.enc.padding)
        return cfg

    def loss_factor(self, epoch: int) -> float:
        """Curriculum ramp (reference: CaeReconstructionLearner.py:53)."""
        return min(0.04 * max(0, epoch - 25), 1)

    # ------------------------------------------------------------ loss

    def _loss(self, dto: CaeDto, factor) -> jnp.ndarray:
        """reference: CaeReconstructionLearner.py:52-70."""
        w = self._label_weights
        rec, gt = dto.reconstructions.gtruth, dto.given_variables.gtruth
        loss = 0.0
        diff_penu_fuct = rec.penu - rec.interpolation
        diff_penu_core = rec.penu - rec.core
        loss += monotonicity_hinge(diff_penu_fuct)
        loss += monotonicity_hinge(diff_penu_core)
        loss += batch_dice_loss(rec.core, gt.core, w)
        loss += batch_dice_loss(rec.penu, gt.penu, w)
        loss += batch_dice_loss(rec.lesion, gt.lesion, w)
        lat = dto.latents.gtruth
        loss += factor * jnp.mean(jnp.abs(lat.interpolation - lat.lesion))
        return loss / (5.0 + factor)

    def _metrics(self, loss, dto: CaeDto) -> dict:
        """reference: CaeReconstructionLearner.py:72-80."""
        wd = self._with_distances
        rec, gt = dto.reconstructions.gtruth, dto.given_variables.gtruth
        out = {"loss": loss}
        out.update(_measures_dict("lesion", binary_measures(
            rec.interpolation, gt.lesion, with_distances=wd)))
        out.update(_measures_dict("core", binary_measures(
            rec.core, gt.core, with_distances=wd)))
        out.update(_measures_dict("penu", binary_measures(
            rec.penu, gt.penu, with_distances=wd)))
        return out

    # ------------------------------------------------------------ steps

    def _augment(self, key, images, labels):
        """Random hemispheric flip + elastic deformation
        (reference: train_shape_reconstruction.py:47-49)."""
        kf, ke = jax.random.split(key)
        images, labels = random_hemispheric_flip(kf, images, labels)
        if self._elastic:
            labels, images2 = elastic_deform_batch(
                ke, labels, images, apply_to_images=self.AUGMENT_IMAGES)
            if self.AUGMENT_IMAGES:
                images = images2
        return images, labels

    def _make_dto(self, batch, step=None):
        return cae_dto_from_batch(
            batch.get(KEY_IMAGES), batch[KEY_LABELS], batch[KEY_GLOBAL],
            step=step, normalization_hours_penumbra=self._norm_hours,
            learn_step=self.LEARN_STEP,
            inputs_from_images=self._inputs_from_images)

    def _init_state(self, dto_like):
        from stroke_prediction_tpu.models.cae3d import Enc3DStep
        init_dto = dto_like
        gv = dto_like.given_variables
        if (isinstance(self._model.enc, Enc3DStep)
                and gv.time_to_treatment is not None):
            # trace the clinical step head at init even when the time is
            # provided (reference torch builds all submodule params at
            # construction; without this a --steplearning phase-1
            # checkpoint would silently reload as plain Enc3D)
            init_dto = dto_like.replace(
                given_variables=gv.replace(time_to_treatment=None))
        # jitted init: unjitted flax init is one RPC per op on the
        # tunneled TPU (~minutes for the CAE stack)
        variables = jax.jit(
            lambda k, d: self._model.init(k, d, BRANCH_GTRUTH, False))(
                self._next_key(), init_dto)
        params = variables["params"]
        tx = self._resolve_tx(params)
        self._state = TrainState(
            params=params, batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))

    def _build(self):
        model = self._model
        ds = self._dataloader_training.dataset
        b0 = ds.stack(self._dataloader_training.indices[:2])
        dev0 = {k: (jnp.asarray(v) if v is not None else None)
                for k, v in b0.items() if k != "case_id"}
        self._init_state(self._make_dto(dev0))
        tx = self._tx

        def train_step(state, batch, key, factor):
            images, labels = self._augment(key, batch.get(KEY_IMAGES),
                                           batch[KEY_LABELS])
            aug = dict(batch)
            aug[KEY_IMAGES], aug[KEY_LABELS] = images, labels
            dto_in = self._make_dto(aug)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    dto_in, BRANCH_GTRUTH, True, mutable=["batch_stats"])
                return self._loss(out, factor), (out, mut)

            (loss, (out, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state,
                batch_stats=mut["batch_stats"], step=state.step + 1)
            return new_state, self._metrics(loss, out)

        def eval_step(state, batch, key, factor):
            dto_in = self._make_dto(batch)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                dto_in, BRANCH_GTRUTH, False)
            return self._metrics(self._loss(out, factor), out)

        self._install_steps(train_step, eval_step)

    # --------------------------------------------------------- reporting

    def print_epoch(self, epoch, phase, m):
        """reference: CaeReconstructionLearner.py:82-90."""
        print("\nEpoch {}/{} {} loss: {:.3} - DC:{:.3}, HD:{:.3}, ASSD:{:.3},"
              " DC core:{:.3}, DC penu.:{:.3}".format(
                  epoch + 1, self._n_epochs, phase, m.get("loss", 0.0),
                  m.get("lesion_dc", 0.0), m.get("lesion_hd", np.inf),
                  m.get("lesion_assd", np.inf), m.get("core_dc", 0.0),
                  m.get("penu_dc", 0.0)), end=" ")

    def plot_epoch(self, plot, epochs):
        """reference: CaeReconstructionLearner.py:92-103."""
        tr, va = self._metric_dtos["training"], self._metric_dtos["validate"]
        plot.plot(epochs, [m["loss"] for m in tr], "r-")
        plot.plot(epochs, [m["loss"] for m in va], "g-")
        plot.plot(epochs, [m.get("lesion_dc", 0) for m in va], "k-")
        plot.plot(epochs, [m.get("core_dc", 0) for m in va], "c+")
        plot.plot(epochs, [m.get("penu_dc", 0) for m in va], "m+")
        plot.set_ylabel(
            "L Train.(red)/Val.(green) | Dice Val. Lesion(b), Core(c), Penu(m)")
        plot.set_ylim(0, 1)
        ax2 = plot.twinx()
        ax2.plot(epochs, [min(m.get("lesion_assd", np.inf), 1e3)
                          for m in va], "b-")
        ax2.set_ylabel("Validation ASSD (blue)", color="b")
        ax2.tick_params("y", colors="b")

    VIS_STEPS = (None, -10, -1, 0, 1, 2, 3, 4, 5, 20)

    def _infer_vis(self, batch_dev, step):
        # jitted with the step as a TRACED scalar: all counterfactual
        # sweeps share two compilations (gt-time / fixed-step) instead
        # of eager op-by-op dispatch per forward (60 forwards per vis
        # trigger; dominant epoch cost on remote-dispatch backends)
        if getattr(self, "_vis_fwd", None) is None:
            model = self._model

            @jax.jit
            def fwd_gt(params, bstats, batch):
                dto = self._make_dto(batch, step=None)
                return model.apply({"params": params, "batch_stats": bstats},
                                   dto, BRANCH_GTRUTH, False)

            @jax.jit
            def fwd_step(params, bstats, batch, step):
                dto = self._make_dto(batch, step=step)
                return model.apply({"params": params, "batch_stats": bstats},
                                   dto, BRANCH_GTRUTH, False)

            self._vis_fwd = (fwd_gt, fwd_step)
        fwd_gt, fwd_step = self._vis_fwd
        params, bstats = self._vis_state()
        if step is None:
            return fwd_gt(params, bstats, batch_dev)
        return fwd_step(params, bstats, batch_dev, jnp.float32(step))

    def visualize_epoch(self, epoch):
        """6-sample x 15-panel counterfactual time-sweep grid
        (reference: CaeReconstructionLearner.py:105-155).  The 10 step
        sweeps share two jitted forwards (gt-time / traced fixed step)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from stroke_prediction_tpu.inference import (
            IMSHOW_VMAX_CBV, IMSHOW_VMAX_TTD)

        samples = self._vis_samples()
        if not samples:
            return
        f, axarr = plt.subplots(max(len(samples), 2), 15)
        for inc, sample in enumerate(samples):
            batch_dev = {
                KEY_IMAGES: (jnp.asarray(sample[KEY_IMAGES])[None]
                             if sample.get(KEY_IMAGES) is not None else None),
                KEY_LABELS: jnp.asarray(sample[KEY_LABELS])[None],
                KEY_GLOBAL: jnp.asarray(sample[KEY_GLOBAL])[None],
            }
            time = float(sample[KEY_GLOBAL][1])
            col = 3
            dto = None
            for step in self.VIS_STEPS:
                dto = self._infer_vis(batch_dev, step)
                rec = np.asarray(dto.reconstructions.gtruth.interpolation)
                zs = min(rec.shape[1] - 1, 14)
                axarr[inc, col].imshow(rec[0, zs, :, :, 0], vmin=0, vmax=1,
                                       cmap="gray")
                if col == 3:
                    col += 1
                col += 1
            imgs = np.asarray(batch_dev[KEY_IMAGES]) \
                if batch_dev[KEY_IMAGES] is not None else None
            labs = np.asarray(batch_dev[KEY_LABELS])
            zs = min(labs.shape[1] - 1, 14)
            if imgs is not None:
                axarr[inc, 0].imshow(imgs[0, zs, :, :, 0], vmin=0,
                                     vmax=IMSHOW_VMAX_CBV, cmap="jet")
                axarr[inc, 1].imshow(imgs[0, zs, :, :, 1], vmin=0,
                                     vmax=IMSHOW_VMAX_TTD, cmap="jet")
            axarr[inc, 2].imshow(labs[0, zs, :, :, 2], vmin=0, vmax=1,
                                 cmap="gray")
            axarr[inc, 4].imshow(labs[0, zs, :, :, 0], vmin=0, vmax=1,
                                 cmap="gray")
            axarr[inc, 14].imshow(labs[0, zs, :, :, 1], vmin=0, vmax=1,
                                  cmap="gray")
            titles = ["CBV", "TTD", "Lesion",
                      "p({:03.1f}h)".format(time), "Core", "p(-10h)",
                      "p(-1h)", "p(0h)", "p(1h)", "p(2h)", "p(3h)", "p(4h)",
                      "p(5h)", "p(20h)", "Penumbra"]
            for ax, title in zip(axarr[inc], titles):
                ax.set_title(title)
        for ax in axarr.flatten():
            ax.title.set_fontsize(3)
            ax.xaxis.set_visible(False)
            ax.yaxis.set_visible(False)
        f.subplots_adjust(hspace=0.05)
        f.savefig(self._path_outputs_base + self.FN_VIS_BASE
                  + str(epoch + 1) + ".png", bbox_inches="tight", dpi=300)
        plt.close(f)

    def _vis_samples(self, n: int = 6):
        samples = []
        for i in self._dataloader_training.indices[:n // 2]:
            samples.append(self._dataloader_training.dataset.sample(i))
        if self._dataloader_validation is not None:
            for i in self._dataloader_validation.indices[:n - len(samples)]:
                samples.append(self._dataloader_validation.dataset.sample(i))
        return samples


class CaeStepLearner(CaeReconstructionLearner):
    """reference: learner/CaeStepLearner.py:7-29 — trains the Enc3DStep
    clinical step head (and whatever else is unfrozen): the
    time-to-treatment is None during training, so the head regresses it."""

    FNB_MARKS = "_cae1step"
    FN_VIS_BASE = "_cae1step_"
    LEARN_STEP = True

    def _loss(self, dto: CaeDto, factor) -> jnp.ndarray:
        """reference: CaeStepLearner.py:15-21."""
        rec, gt = dto.reconstructions.gtruth, dto.given_variables.gtruth
        diff_penu_fuct = rec.penu - rec.interpolation
        loss = monotonicity_hinge(diff_penu_fuct)
        loss += batch_dice_loss(rec.interpolation, gt.lesion,
                                self._label_weights)
        return loss / 2.0

    def _make_dto(self, batch, step=None):
        # step given (vis sweeps) uses the fixed normalized step; step None
        # triggers the learned head (reference: CaeStepLearner.py:23-29)
        return cae_dto_from_batch(
            batch.get(KEY_IMAGES), batch[KEY_LABELS], batch[KEY_GLOBAL],
            step=step, normalization_hours_penumbra=self._norm_hours,
            learn_step=(step is None))


class CaePredictionLearner(CaeReconstructionLearner):
    """reference: learner/CaePredictionLearner.py:10-141 — phase 2: a new
    encoder is trained on U-Net segmentations against a frozen phase-1 CAE.
    Only the new encoder's params are optimized; the CAE variables are
    closed over as constants of the jitted step."""

    FNB_MARKS = "_cae2"
    FN_VIS_BASE = "_cae2_"
    AUGMENT_IMAGES = True      # ElasticDeform(apply_to_images=True)

    def __init__(self, dataloader_training, dataloader_validation, cae_model,
                 cae_variables, enc_model, optimizer, lr_schedule, n_epochs,
                 **kw):
        self._cae_model = cae_model
        self._cae_variables = cae_variables
        self._enc_model = enc_model
        super().__init__(dataloader_training, dataloader_validation,
                         cae_model, optimizer, lr_schedule, n_epochs, **kw)

    def model_config(self) -> dict:
        return {"kind": "cae3d",
                "channels": list(self._cae_model.enc.channels),
                "n_ch_global": self._cae_model.enc.n_ch_global,
                "step": False}

    def enc_config(self) -> dict:
        return {"kind": "enc3d",
                "channels": list(self._enc_model.channels),
                "n_ch_global": self._enc_model.n_ch_global}

    def adapt_betas(self, epoch):
        """reference: CaePredictionLearner.py:39-40 (no β₁ ramp)."""
        pass

    def _loss(self, dto: CaeDto, factor) -> jnp.ndarray:
        """reference: CaePredictionLearner.py:42-57."""
        rec_in = dto.reconstructions.inputs
        gt = dto.given_variables.gtruth
        lat_gt, lat_in = dto.latents.gtruth, dto.latents.inputs
        loss = monotonicity_hinge(rec_in.penu - rec_in.interpolation)
        loss += monotonicity_hinge(rec_in.penu - rec_in.core)
        loss += batch_dice_loss(rec_in.interpolation, gt.lesion,
                                self._label_weights)
        loss += jnp.mean(jnp.abs(lat_gt.interpolation - lat_in.interpolation))
        loss += jnp.mean(jnp.abs(lat_gt.core - lat_in.core))
        loss += jnp.mean(jnp.abs(lat_gt.penu - lat_in.penu))
        return loss / 6.0

    def _make_dto(self, batch, step=None):
        return cae_dto_from_batch(
            batch.get(KEY_IMAGES), batch[KEY_LABELS], batch[KEY_GLOBAL],
            step=step, normalization_hours_penumbra=self._norm_hours,
            inputs_from_images=True)

    def _forward(self, enc_params, enc_batch_stats, dto_in, train):
        return cae_enc_inference(
            self._cae_model, self._cae_variables, self._enc_model,
            {"params": enc_params, "batch_stats": enc_batch_stats},
            dto_in, train=train,
            enc_mutable=["batch_stats"] if train else False)

    def _build(self):
        ds = self._dataloader_training.dataset
        b0 = ds.stack(self._dataloader_training.indices[:2])
        dev0 = {k: (jnp.asarray(v) if v is not None else None)
                for k, v in b0.items() if k != "case_id"}
        dto0 = self._make_dto(dev0)
        enc_vars = jax.jit(
            lambda k, d: self._enc_model.init(k, d, BRANCH_INPUTS, False))(
                self._next_key(), dto0)
        params = enc_vars["params"]
        tx = self._resolve_tx(params)
        self._state = TrainState(
            params=params, batch_stats=enc_vars.get("batch_stats", {}),
            opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))

        def train_step(state, batch, key, factor):
            images, labels = self._augment(key, batch.get(KEY_IMAGES),
                                           batch[KEY_LABELS])
            aug = dict(batch)
            aug[KEY_IMAGES], aug[KEY_LABELS] = images, labels
            dto_in = self._make_dto(aug)

            def loss_fn(params):
                out, mut = self._forward(params, state.batch_stats, dto_in,
                                         True)
                return self._loss(out, factor), (out, mut)

            (loss, (out, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state,
                batch_stats=mut["batch_stats"], step=state.step + 1)
            return new_state, self._metrics(loss, out)

        def eval_step(state, batch, key, factor):
            dto_in = self._make_dto(batch)
            out = self._forward(state.params, state.batch_stats, dto_in,
                                False)
            return self._metrics(self._loss(out, factor), out)

        self._install_steps(train_step, eval_step)

    def save_model(self, suffix: str = ""):
        """Dual checkpointing: frozen CAE under the main name, the new
        encoder under '_enc' (reference: CaePredictionLearner.py:27-37).
        Lead-only, like the base (learner.py): in a multi-host run only
        process 0 writes, or concurrent writers race on a shared FS."""
        if not self._is_lead():
            return
        from stroke_prediction_tpu.train import checkpoint as ckpt
        ckpt.save_checkpoint(
            self.path("save", "model", suffix),
            {"params": self._cae_variables["params"],
             "batch_stats": self._cae_variables.get("batch_stats", {})},
            self.model_config())
        ckpt.save_checkpoint(self.path("save", "model", "_enc" + suffix),
                             self._state_dict(), self.enc_config())

    def load_model(self):
        from stroke_prediction_tpu.train import checkpoint as ckpt
        state, _ = ckpt.load_checkpoint(self.path("load", "model", "_enc"))
        self._state = self._state.replace(params=state["params"],
                                          batch_stats=state["batch_stats"])

    def _infer_vis(self, batch_dev, step):
        if getattr(self, "_vis_fwd", None) is None:
            @jax.jit
            def fwd_gt(params, bstats, batch):
                return self._forward(params, bstats,
                                     self._make_dto(batch, step=None),
                                     False)

            @jax.jit
            def fwd_step(params, bstats, batch, step):
                return self._forward(params, bstats,
                                     self._make_dto(batch, step=step),
                                     False)

            self._vis_fwd = (fwd_gt, fwd_step)
        fwd_gt, fwd_step = self._vis_fwd
        params, bstats = self._vis_state()
        if step is None:
            return fwd_gt(params, bstats, batch_dev)
        return fwd_step(params, bstats, batch_dev, jnp.float32(step))

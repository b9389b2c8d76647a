"""U-Net segmentation learner.

reference: learner/UnetSegmentationLearner.py — loss is the mean of the
core and penumbra BatchDiceLoss terms; per-batch binary measures for both
structures; console line, loss+Dice curve plot, and a 6-sample x 6-panel
visualization grid.

TPU redesign: the per-batch work (random-patch augmentation, forward,
Dice loss, backward, Adam update, measures) is ONE jitted device step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stroke_prediction_tpu.data.augment import random_patch
from stroke_prediction_tpu.data.dataset import (
    KEY_GLOBAL, KEY_IMAGES, KEY_LABELS)
from stroke_prediction_tpu.eval.metrics import batch_dice_loss, binary_measures
from stroke_prediction_tpu.train.learner import Learner, TrainState


def _measures_dict(prefix: str, m) -> dict:
    return {f"{prefix}_dc": m.dc, f"{prefix}_hd": m.hd,
            f"{prefix}_assd": m.assd, f"{prefix}_precision": m.precision,
            f"{prefix}_sensitivity": m.sensitivity,
            f"{prefix}_specificity": m.specificity}


class UnetSegmentationLearner(Learner):
    """reference: learner/UnetSegmentationLearner.py:10-103."""

    FNB_MARKS = "_unet"
    FN_VIS_BASE = "_visual_"

    def __init__(self, dataloader_training, dataloader_validation,
                 unet_model, optimizer, lr_schedule, n_epochs,
                 patch_whd: Optional[Tuple[int, int, int]] = (104, 104, 68),
                 pad_xyz: Tuple[int, int, int] = (20, 20, 20),
                 label_weights=(1.0,), **kw):
        self._patch = tuple(patch_whd) if patch_whd else None
        self._pad = tuple(pad_xyz)
        self._label_weights = tuple(label_weights)
        super().__init__(dataloader_training, dataloader_validation,
                         unet_model, optimizer, lr_schedule, n_epochs, **kw)

    def model_config(self) -> dict:
        return {"kind": "unet3d", "channels": list(self._model.channels)}

    # ------------------------------------------------------------ stepping

    def _loss(self, core, penu, core_gt, penu_gt):
        """Mean of core+penumbra Dice losses
        (reference: UnetSegmentationLearner.py:21-28)."""
        w = self._label_weights
        return (batch_dice_loss(core, core_gt, w)
                + batch_dice_loss(penu, penu_gt, w)) / 2.0

    def _forward_loss(self, params, batch_stats, images, labels, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            seg, mut = self._model.apply(variables, images, train=True,
                                         mutable=["batch_stats"])
        else:
            seg, mut = self._model.apply(variables, images, train=False), None
        core, penu = seg[..., 0:1], seg[..., 1:2]
        core_gt, penu_gt = labels[..., 0:1], labels[..., 1:2]
        loss = self._loss(core, penu, core_gt, penu_gt)
        return loss, (core, penu, core_gt, penu_gt, mut)

    def _metrics(self, loss, core, penu, core_gt, penu_gt) -> dict:
        wd = self._with_distances
        out = {"loss": loss}
        out.update(_measures_dict(
            "core", binary_measures(core, core_gt, with_distances=wd)))
        out.update(_measures_dict(
            "penu", binary_measures(penu, penu_gt, with_distances=wd)))
        return out

    def _build(self):
        model = self._model
        sample = self._dataloader_training.dataset.sample(
            self._dataloader_training.indices[0])
        d, h, w, c = sample[KEY_IMAGES].shape
        if self._patch:
            pw, ph, pd = self._patch
            init_shape = (2, pd, ph, pw, c)
        else:
            init_shape = (2, d, h, w, c)
        # jitted init: unjitted flax init executes op-by-op, which on
        # the tunneled TPU is one RPC per op (~minutes for this net)
        variables = jax.jit(
            lambda k, z: self._model.init(k, z, train=False))(
                self._next_key(), jnp.zeros(init_shape))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = self._resolve_tx(params)
        self._state = TrainState(params=params, batch_stats=batch_stats,
                                 opt_state=tx.init(params),
                                 step=jnp.zeros((), jnp.int32))

        def augment(key, images, labels):
            if self._patch is None:
                return images, labels
            return random_patch(key, images, labels, self._patch, self._pad)

        def train_step(state, batch, key, factor):
            images, labels = augment(key, batch[KEY_IMAGES],
                                     batch[KEY_LABELS])

            def loss_fn(params):
                return self._forward_loss(params, state.batch_stats, images,
                                          labels, train=True)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            core, penu, core_gt, penu_gt, mut = aux
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state,
                batch_stats=mut["batch_stats"], step=state.step + 1)
            return new_state, self._metrics(loss, core, penu, core_gt,
                                            penu_gt)

        def eval_step(state, batch, key, factor):
            # validation also uses a random patch
            # (reference: train_unet_segmentation.py:44-48)
            images, labels = augment(key, batch[KEY_IMAGES],
                                     batch[KEY_LABELS])
            loss, (core, penu, core_gt, penu_gt, _) = self._forward_loss(
                state.params, state.batch_stats, images, labels, train=False)
            return self._metrics(loss, core, penu, core_gt, penu_gt)

        self._install_steps(train_step, eval_step)

    # --------------------------------------------------------- reporting

    def print_epoch(self, epoch, phase, m):
        """reference: UnetSegmentationLearner.py:48-53."""
        print("\nEpoch {}/{} {} loss: {:.3} - DC Core:{:.3}, DC Penumbra:{:.3}"
              .format(epoch + 1, self._n_epochs, phase, m.get("loss", 0.0),
                      m.get("core_dc", 0.0), m.get("penu_dc", 0.0)),
              end=" ")

    def plot_epoch(self, plot, epochs):
        """reference: UnetSegmentationLearner.py:55-60."""
        tr, va = self._metric_dtos["training"], self._metric_dtos["validate"]
        plot.plot(epochs, [m["loss"] for m in tr], "r-")
        plot.plot(epochs, [m["loss"] for m in va], "g-")
        plot.plot(epochs, [m.get("core_dc", 0) for m in va], "c+")
        plot.plot(epochs, [m.get("penu_dc", 0) for m in va], "m+")
        plot.set_ylabel("L Train.(red)/Val.(green) | Dice Val. Core(c), Penu(m)")

    def visualize_epoch(self, epoch):
        """6-sample x 6-panel grid: CBV, core GT, p(core), p(penu),
        penu GT, TTD (reference: UnetSegmentationLearner.py:62-103)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from stroke_prediction_tpu.inference import (
            IMSHOW_VMAX_CBV, IMSHOW_VMAX_TTD)

        samples = self._vis_samples()
        if not samples:
            return
        f, axarr = plt.subplots(max(len(samples), 2), 6)
        pad = self._pad
        for inc, sample in enumerate(samples):
            images = jnp.asarray(sample[KEY_IMAGES])[None]
            labels = jnp.asarray(sample[KEY_LABELS])[None]
            if getattr(self, "_vis_fwd", None) is None:
                model = self._model
                self._vis_fwd = jax.jit(lambda p, b, x: model.apply(
                    {"params": p, "batch_stats": b}, x, train=False))
            seg = self._vis_fwd(*self._vis_state(), images)
            imgs = np.asarray(images)
            zs = min(imgs.shape[1] - 1, 34)
            zso = min(np.asarray(seg).shape[1] - 1, 14)
            axarr[inc, 0].imshow(
                imgs[0, zs, pad[1]:-pad[1], pad[0]:-pad[0], 0],
                vmin=0, vmax=IMSHOW_VMAX_CBV, cmap="jet")
            axarr[inc, 1].imshow(np.asarray(labels)[0, zso, :, :, 0],
                                 vmin=0, vmax=1, cmap="gray")
            axarr[inc, 2].imshow(np.asarray(seg)[0, zso, :, :, 0],
                                 vmin=0, vmax=1, cmap="gray")
            axarr[inc, 3].imshow(np.asarray(seg)[0, zso, :, :, 1],
                                 vmin=0, vmax=1, cmap="gray")
            axarr[inc, 4].imshow(np.asarray(labels)[0, zso, :, :, 1],
                                 vmin=0, vmax=1, cmap="gray")
            axarr[inc, 5].imshow(
                imgs[0, zs, pad[1]:-pad[1], pad[0]:-pad[0], 1],
                vmin=0, vmax=IMSHOW_VMAX_TTD, cmap="jet")
            for ax, title in zip(axarr[inc], ["CBV", "Core GT", "p(Core)",
                                              "p(Penu.)", "Penu. GT", "TTD"]):
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
        """First 3 train + 3 valid samples (reference: util.py:8-34)."""
        samples = []
        for i in self._dataloader_training.indices[:n // 2]:
            samples.append(self._dataloader_training.dataset.sample(i))
        if self._dataloader_validation is not None:
            for i in self._dataloader_validation.indices[:n - len(samples)]:
                samples.append(self._dataloader_validation.dataset.sample(i))
        return samples

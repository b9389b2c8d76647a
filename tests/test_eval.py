"""Tester-engine integration tests: factory-loaded models, per-case
metrics, NIfTI dumps, curve sweeps — on tiny synthetic geometry."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD,
    StrokeDataset3D, SyntheticCaseProvider)
from stroke_prediction_tpu.data.loader import get_testdata
from stroke_prediction_tpu.models.cae3d import Cae3D, Dec3D, Enc3D
from stroke_prediction_tpu.models.unet3d import Unet3D
from stroke_prediction_tpu.train.checkpoint import save_checkpoint
from stroke_prediction_tpu.core.dto import BRANCH_GTRUTH


@pytest.fixture(scope="module")
def cae_checkpoint(tmp_path_factory):
    out = tmp_path_factory.mktemp("eval")
    ch = (1, 2, 3, 4, 5, 6, 1)
    cae = Cae3D(enc=Enc3D(channels=ch, n_ch_global=5),
                dec=Dec3D(channels=ch, n_ch_global=5))
    from stroke_prediction_tpu.inference import cae_dto_from_batch
    dto = cae_dto_from_batch(None, jnp.zeros((1, 28, 64, 64, 3)),
                             jnp.ones((1, 5)))
    variables = cae.init(jax.random.PRNGKey(0), dto, BRANCH_GTRUTH, False)
    path = str(out / "tiny_cae1.model")
    save_checkpoint(path, {"params": variables["params"],
                           "batch_stats": variables.get("batch_stats", {})},
                    {"kind": "cae3d", "channels": list(ch),
                     "n_ch_global": 5, "step": False})
    return path, out


@pytest.fixture(scope="module")
def test_loader():
    provider = SyntheticCaseProvider(n_cases=3, shape_xyz=(64, 64, 28),
                                     seed=4)
    ds = StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                         [LABEL_CORE, LABEL_PENU, LABEL_LESION])
    return get_testdata(ds, [0, 2], seed=1)


class TestCaeTester:
    def test_run_inference_outputs(self, cae_checkpoint, test_loader,
                                   capsys):
        from stroke_prediction_tpu.eval.cae_tester import (
            CaeReconstructionTester)
        path, out = cae_checkpoint
        tester = CaeReconstructionTester(test_loader, path,
                                         str(out / "shape"), 10)
        tester.run_inference()
        printed = capsys.readouterr().out
        assert "normalized_time_to_treatment" in printed
        assert "DC=" in printed and "HD=" in printed
        files = os.listdir(out)
        for cid in (0, 2):
            for sfx in ("_core", "_pred", "_penu"):
                assert f"shape_{cid}{sfx}.nii.gz" in files

    def test_nifti_output_native_resolution(self, cae_checkpoint,
                                            test_loader):
        from stroke_prediction_tpu.utils.nifti import read_nifti
        _, out = cae_checkpoint
        data, affine = read_nifti(str(out / "shape_0_pred.nii.gz"))
        # 2x in-plane zoom back to native (X, Y, Z) = (128, 128, 28)
        assert data.shape == (128, 128, 28)

    def test_counterfactual_step_changes_interpolation(self, cae_checkpoint,
                                                       test_loader):
        from stroke_prediction_tpu.eval.cae_tester import (
            CaeReconstructionTester)
        path, out = cae_checkpoint
        tester = CaeReconstructionTester(test_loader, path,
                                         str(out / "cf"), 10)
        batch = next(iter(test_loader))
        _, dto0 = tester.infer_batch(batch, step=0.0)
        _, dto5 = tester.infer_batch(batch, step=5.0)
        lat0 = np.asarray(dto0.latents.gtruth.interpolation)
        lat5 = np.asarray(dto5.latents.gtruth.interpolation)
        assert not np.allclose(lat0, lat5)
        # step=0 -> interpolation collapses to the core latent
        np.testing.assert_allclose(
            lat0, np.asarray(dto0.latents.gtruth.core), rtol=1e-4, atol=1e-5)


class TestCurveSweep:
    def test_batched_sweep_matches_serial(self, cae_checkpoint,
                                          test_loader):
        """The vmapped step-axis sweep (SURVEY.md §7) must reproduce the
        serial per-step results."""
        from stroke_prediction_tpu.eval.cae_tester import (
            CaeReconstructionTesterCurve)
        path, out = cae_checkpoint
        tester = CaeReconstructionTesterCurve(
            test_loader, path, str(out / "curve"), 10,
            ta_to_tr_fixed_hours=[0.0, 2.0, 5.0])
        batch = next(iter(test_loader))
        batched, _ = tester.infer_batch_steps(batch, [0.0, 2.0, 5.0])
        for i, step in enumerate([0.0, 2.0, 5.0]):
            serial, _ = tester.infer_batch(batch, step)
            assert batched[i].dc == pytest.approx(serial["lesion"].dc,
                                                  abs=1e-5)
            assert batched[i].assd == pytest.approx(
                serial["lesion"].assd, abs=1e-3)

    def test_run_inference_prints_all_sweeps(self, cae_checkpoint,
                                             test_loader, capsys):
        from stroke_prediction_tpu.eval.cae_tester import (
            CaeReconstructionTesterCurve)
        path, out = cae_checkpoint
        tester = CaeReconstructionTesterCurve(
            test_loader, path, str(out / "curve2"), 10,
            ta_to_tr_fixed_hours=[0.0, 1.0],
            ta_to_tr_relative_steps=[0.5, 1.0])
        tester.run_inference()
        printed = capsys.readouterr().out
        assert printed.count("ta_to_tr fixed=") == 2 * 2    # 2 cases
        assert printed.count("ta_to_tr ratio=") == 2 * 2
        assert printed.count("tr_to_penumbra=") == 11 * 2


class TestUnetTester:
    def test_run_inference(self, tmp_path, capsys):
        ch = (2, 4, 6, 8, 6, 4, 6, 2)
        model = Unet3D(channels=ch)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 44, 44, 44, 2)), train=False)
        path = str(tmp_path / "tiny_unet.model")
        save_checkpoint(path, {"params": variables["params"],
                               "batch_stats": variables["batch_stats"]},
                        {"kind": "unet3d", "channels": list(ch)})
        provider = SyntheticCaseProvider(n_cases=2, shape_xyz=(24, 24, 24),
                                         seed=4)
        # padded to 64^3 -> valid-conv output 24^3 == label size
        ds = StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                             [LABEL_CORE, LABEL_PENU], pad=(20, 20, 20))
        loader = get_testdata(ds, [0, 1], seed=1)
        from stroke_prediction_tpu.eval.unet_tester import (
            UnetSegmentationTester)
        tester = UnetSegmentationTester(loader, path, str(tmp_path / "u"),
                                        None)
        tester.run_inference()
        printed = capsys.readouterr().out
        assert "DC Core" in printed
        assert os.path.exists(str(tmp_path / "u_0_core.nii.gz"))
        assert os.path.exists(str(tmp_path / "u_1_penu.nii.gz"))

"""Loss/metric parity tests: hand-computed Dice, scipy-checked surface
distances (medpy is unavailable here; its HD/ASSD definition is
re-derived with scipy EDT in-test)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu.eval.metrics import (
    batch_dice_loss, binary_measures_host, monotonicity_hinge)


class TestBatchDiceLoss:
    def test_perfect_match_is_zero(self):
        t = jnp.zeros((2, 4, 4, 4, 1)).at[:, 1:3, 1:3, 1:3, :].set(1.0)
        loss = batch_dice_loss(t, t)
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_hand_computed(self):
        # o = [1, 1, 0, 0], t = [1, 0, 0, 1]:
        # dice = 2*1/(2+2) = 0.5 -> loss 0.5
        o = jnp.asarray([1.0, 1, 0, 0]).reshape(1, 4, 1, 1, 1)
        t = jnp.asarray([1.0, 0, 0, 1]).reshape(1, 4, 1, 1, 1)
        assert float(batch_dice_loss(o, t)) == pytest.approx(0.5, abs=1e-5)

    def test_soft_values(self):
        o = jnp.asarray([0.5, 0.5]).reshape(1, 2, 1, 1, 1)
        t = jnp.asarray([1.0, 0.0]).reshape(1, 2, 1, 1, 1)
        # 2*0.5/(0.25+0.25+1) = 2/3 -> loss 1/3
        assert float(batch_dice_loss(o, t)) == pytest.approx(1 / 3, abs=1e-5)

    def test_label_weighting(self):
        o = jnp.ones((1, 2, 1, 1, 2))
        t = jnp.ones((1, 2, 1, 1, 2))
        loss = batch_dice_loss(o, t, label_weights=(0.5, 0.5))
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_channel_mismatch_asserts(self):
        with pytest.raises(AssertionError):
            batch_dice_loss(jnp.ones((1, 2, 1, 1, 2)),
                            jnp.ones((1, 2, 1, 1, 2)),
                            label_weights=(1.0,))


class TestMonotonicityHinge:
    def test_positive_diff_free(self):
        assert float(monotonicity_hinge(jnp.asarray([1.0, 2.0]))) == 0.0

    def test_negative_diff_penalized(self):
        # |d| - d = 2|d| for d<0 -> mean([2*1, 0]) = 1
        assert float(monotonicity_hinge(
            jnp.asarray([-1.0, 1.0]))) == pytest.approx(1.0)


def _scipy_surface_distances(a, b):
    """medpy-equivalent surface distances via scipy."""
    from scipy.ndimage import binary_erosion, distance_transform_edt
    from scipy.ndimage import generate_binary_structure
    conn = generate_binary_structure(3, 1)
    sa = a & ~binary_erosion(a, conn, border_value=0)
    sb = b & ~binary_erosion(b, conn, border_value=0)
    dt = distance_transform_edt(~sb)
    return dt[sa]


class TestBinaryMeasures:
    def _masks(self):
        rng = np.random.RandomState(7)
        z, y, x = np.ogrid[:16, :16, :16]
        a = ((z - 8) ** 2 + (y - 8) ** 2 + (x - 8) ** 2) <= 20
        b = ((z - 7) ** 2 + (y - 9) ** 2 + (x - 8) ** 2) <= 25
        return a, b

    def test_confusion_measures(self):
        a, b = self._masks()
        m = binary_measures_host(a.astype(np.float32), b.astype(np.float32),
                                 with_distances=False)
        tp = np.sum(a & b); fp = np.sum(a & ~b); fn = np.sum(~a & b)
        tn = np.sum(~a & ~b)
        assert m.dc == pytest.approx(2 * tp / (2 * tp + fp + fn), abs=1e-5)
        assert m.precision == pytest.approx(tp / (tp + fp), abs=1e-5)
        assert m.sensitivity == pytest.approx(tp / (tp + fn), abs=1e-5)
        assert m.specificity == pytest.approx(tn / (tn + fp), abs=1e-5)

    def test_hd_assd_vs_scipy(self):
        a, b = self._masks()
        m = binary_measures_host(a.astype(np.float32), b.astype(np.float32))
        d_ab = _scipy_surface_distances(a, b)
        d_ba = _scipy_surface_distances(b, a)
        hd_ref = max(d_ab.max(), d_ba.max())
        assd_ref = (d_ab.sum() + d_ba.sum()) / (len(d_ab) + len(d_ba))
        assert m.hd == pytest.approx(hd_ref, abs=1e-3)
        assert m.assd == pytest.approx(assd_ref, abs=1e-3)

    def test_empty_mask_inf_distances(self):
        a = np.zeros((8, 8, 8), np.float32)
        b = np.ones((8, 8, 8), np.float32)
        m = binary_measures_host(a, b)
        assert np.isinf(m.hd) and np.isinf(m.assd)

    def test_prc_distance(self):
        a, b = self._masks()
        m = binary_measures_host(a.astype(np.float32), b.astype(np.float32),
                                 with_distances=False)
        expect = np.sqrt((1 - m.precision) ** 2 + (1 - m.sensitivity) ** 2)
        assert m.prc_euclidean_distance == pytest.approx(expect, abs=1e-6)

"""SDM interpolation baseline tests (reference behavior:
test_sdm_resampling.py:15-52)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu.eval.sdm import sdm_interpolate


def _ball(shape, center, r):
    z, y, x = np.ogrid[:shape[0], :shape[1], :shape[2]]
    return (((z - center[0]) ** 2 + (y - center[1]) ** 2
             + (x - center[2]) ** 2) <= r * r).astype(np.float32)


class TestSdmInterpolate:
    def setup_method(self, _):
        self.shape = (12, 48, 48)
        self.core = _ball(self.shape, (6, 24, 24), 5)
        self.penu = _ball(self.shape, (6, 24, 24), 15)

    def test_endpoints_no_downsample(self):
        rc, ri0, rp, *_ = sdm_interpolate(
            jnp.asarray(self.core), jnp.asarray(self.penu), 0.0,
            resample=False)
        # t=0: interpolation = -core_sdm -> >0 exactly inside the core
        np.testing.assert_array_equal(np.asarray(ri0) > 0,
                                      np.asarray(rc) < 0)
        _, ri1, _, *_ = sdm_interpolate(
            jnp.asarray(self.core), jnp.asarray(self.penu), 1.0,
            resample=False)
        np.testing.assert_array_equal(np.asarray(ri1) > 0,
                                      np.asarray(rp) > 0)

    def test_reconstruction_masks_match(self):
        rc, _, rp, *_ = sdm_interpolate(
            jnp.asarray(self.core), jnp.asarray(self.penu), 0.5,
            resample=False)
        core_rec = np.asarray(rc) < 0
        penu_rec = np.asarray(rp) > 0
        np.testing.assert_array_equal(core_rec, self.core > 0.5)
        np.testing.assert_array_equal(penu_rec, self.penu > 0.5)

    def test_intermediate_between(self):
        _, ri, _, *_ = sdm_interpolate(
            jnp.asarray(self.core), jnp.asarray(self.penu), 0.5,
            resample=False)
        inter = np.asarray(ri) > 0
        assert self.core.sum() < inter.sum() < self.penu.sum()
        assert np.all((self.core > 0.5) <= inter)
        assert np.all(inter <= (self.penu > 0.5))

    def test_monotone_growth_in_t(self):
        sizes = []
        for t in (0.0, 0.3, 0.6, 1.0):
            _, ri, _, *_ = sdm_interpolate(
                jnp.asarray(self.core), jnp.asarray(self.penu), t,
                resample=False)
            sizes.append(int((np.asarray(ri) > 0).sum()))
        assert sizes == sorted(sizes)

    def test_downsample_roundtrip_shapes(self):
        # zoom 4 keeps a meaningful latent at this test size (the
        # reference's zoom 12 targets 128-wide planes)
        rc, ri, rp, lc, li, lp = sdm_interpolate(
            jnp.asarray(self.core), jnp.asarray(self.penu), 0.5,
            zoom=4, resample=True)
        assert np.asarray(rc).shape == self.shape
        assert np.asarray(ri).shape == self.shape
        # latent in-plane size = round(48/4) = 12
        assert np.asarray(li).shape == (12, 12, 12)
        # downsampled reconstruction still roughly between core and penumbra
        inter = np.asarray(ri) > 0
        assert 0 < inter.sum() <= (self.penu > 0.5).sum() * 1.5

    def test_empty_core_gets_artificial_seed(self):
        # With an empty core mask, an artificial core is dilated at the
        # penumbra center of mass (reference: test_sdm_resampling.py:26-30).
        # The core SDM is then 0 inside the seed and positive outside, so
        # the t=0.5 interpolation stays anchored around the seed instead of
        # collapsing to the empty set.
        empty = np.zeros(self.shape, np.float32)
        rc, ri, _, *_ = sdm_interpolate(
            jnp.asarray(empty), jnp.asarray(self.penu), 0.5,
            resample=False, dilate=3)
        rc = np.asarray(rc)
        assert rc.min() == 0.0                     # anchored, never negative
        assert rc[6, 24, 24] == 0.0                # seed at penumbra COM
        assert rc[0, 0, 0] > 0
        inter = np.asarray(ri) > 0
        assert inter.sum() > 0                     # interpolation non-empty
        assert inter[6, 24, 24]
        assert inter.sum() < (self.penu > 0.5).sum()

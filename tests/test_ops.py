"""Kernel parity tests: resize / pooling / warp / EDT vs scipy & golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu import ops


class TestResize:
    def test_upsample2x_shape(self):
        x = jnp.ones((2, 5, 9, 9, 3))
        y = ops.upsample2x_trilinear(x)
        assert y.shape == (2, 10, 18, 18, 3)

    def test_upsample_preserves_constant(self):
        x = jnp.full((1, 4, 6, 6, 1), 3.5)
        y = ops.upsample2x_trilinear(x)
        np.testing.assert_allclose(np.asarray(y), 3.5, rtol=1e-6)

    def test_linear_matches_align_corners_endpoints(self):
        x = jnp.arange(5.0).reshape(1, 1, 1, 5, 1)
        y = ops.resize_linear(x, (10,), (3,))
        assert float(y[0, 0, 0, 0, 0]) == 0.0
        assert float(y[0, 0, 0, -1, 0]) == 4.0

    def test_zoom_inplane_half(self):
        x = jnp.ones((28, 128, 128, 2))
        y = ops.zoom_inplane(x, 0.5)
        assert y.shape == (28, 64, 64, 2)

    def test_zoom_inplane_vs_scipy_linear(self):
        from scipy import ndimage as ndi
        rng = np.random.RandomState(0)
        img = rng.rand(16, 16).astype(np.float32)
        ours = ops.zoom_inplane(jnp.asarray(img[None, :, :, None]), 0.5,
                                order=1)[0, :, :, 0]
        ref = ndi.zoom(img, 0.5, order=1)
        assert ours.shape == ref.shape
        # scipy spline prefilter differs slightly; allow loose tolerance
        np.testing.assert_allclose(np.asarray(ours), ref, atol=0.35)

    def test_center_crop(self):
        x = jnp.arange(5 * 6 * 7).reshape(1, 5, 6, 7, 1).astype(jnp.float32)
        y = ops.center_crop(x, (3, 2, 3))
        assert y.shape == (1, 3, 2, 3, 1)
        np.testing.assert_array_equal(np.asarray(y[0, :, :, :, 0]),
                                      np.asarray(x[0, 1:4, 2:4, 2:5, 0]))


class TestPooling:
    def test_maxpool_shape_and_values(self):
        x = jnp.arange(4 * 4 * 4, dtype=jnp.float32).reshape(1, 4, 4, 4, 1)
        y = ops.max_pool3d(x)
        assert y.shape == (1, 2, 2, 2, 1)
        assert float(y[0, -1, -1, -1, 0]) == 63.0

    def test_maxpool_odd_floor(self):
        x = jnp.zeros((1, 5, 7, 9, 2))
        assert ops.max_pool3d(x).shape == (1, 2, 3, 4, 2)


class TestWarp:
    def test_gaussian_matches_scipy(self):
        from scipy.ndimage import gaussian_filter
        rng = np.random.RandomState(1)
        vol = rng.rand(10, 12, 14).astype(np.float32)
        ours = np.asarray(ops.gaussian_filter3d(jnp.asarray(vol), 2.0))
        ref = gaussian_filter(vol, 2.0, mode="constant", cval=0)
        # ours accumulates in float32 (device dtype); scipy in float64
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_map_coordinates_identity(self):
        rng = np.random.RandomState(2)
        vol = rng.rand(6, 7, 8).astype(np.float32)
        coords = jnp.stack(jnp.meshgrid(jnp.arange(6), jnp.arange(7),
                                        jnp.arange(8), indexing="ij"),
                           axis=0).astype(jnp.float32)
        out = ops.map_coordinates_linear(jnp.asarray(vol), coords)
        np.testing.assert_allclose(np.asarray(out), vol, atol=1e-6)

    def test_map_coordinates_matches_scipy(self):
        from scipy.ndimage import map_coordinates
        rng = np.random.RandomState(3)
        vol = rng.rand(6, 7, 8).astype(np.float32)
        coords = np.stack(np.meshgrid(np.arange(6), np.arange(7),
                                      np.arange(8), indexing="ij"),
                          axis=0).astype(np.float32)
        coords = coords + rng.uniform(-1.5, 1.5, coords.shape).astype(np.float32)
        ours = np.asarray(ops.map_coordinates_linear(
            jnp.asarray(vol), jnp.asarray(coords)))
        ref = map_coordinates(vol, coords.reshape(3, -1), order=1).reshape(
            vol.shape)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_elastic_deform_deterministic(self):
        key = jax.random.PRNGKey(0)
        labels = jnp.zeros((8, 16, 16, 2)).at[3:5, 6:10, 6:10, :].set(1.0)
        out1, _ = ops.elastic_deform3d(key, labels)
        out2, _ = ops.elastic_deform3d(key, labels)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert out1.shape == labels.shape


class TestEdt:
    def test_edt_matches_scipy(self):
        from scipy.ndimage import distance_transform_edt as scipy_edt
        rng = np.random.RandomState(4)
        mask = (rng.rand(12, 14, 10) > 0.7)
        ours = np.asarray(ops.distance_transform_edt(jnp.asarray(mask)))
        ref = scipy_edt(mask)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_edt_ball(self):
        from scipy.ndimage import distance_transform_edt as scipy_edt
        z, y, x = np.ogrid[:16, :16, :16]
        ball = ((z - 8) ** 2 + (y - 8) ** 2 + (x - 8) ** 2) <= 25
        ours = np.asarray(ops.distance_transform_edt(jnp.asarray(ball)))
        ref = scipy_edt(ball)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_signed_edt_signs(self):
        z, y, x = np.ogrid[:12, :12, :12]
        ball = (((z - 6) ** 2 + (y - 6) ** 2 + (x - 6) ** 2) <= 9).astype(
            np.float32)
        s = np.asarray(ops.signed_edt(jnp.asarray(ball)))
        assert s[6, 6, 6] > 0
        assert s[0, 0, 0] < 0


def test_parabola_pass_pallas_matches_xla():
    """The line-resident Pallas min-plus EDT pass (TPU default) must
    match the chunked XLA formulation (interpret mode on CPU)."""
    import numpy as np
    import jax.numpy as jnp
    from stroke_prediction_tpu.ops.edt import (
        _parabola_pass_pallas, _parabola_pass_xla)
    rng = np.random.RandomState(0)
    f2 = jnp.asarray(rng.rand(3, 21, 37) * 50, jnp.float32)
    for axis in (1, 2):
        a = _parabola_pass_xla(f2, axis)
        b = _parabola_pass_pallas(f2, axis, block=16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-5)

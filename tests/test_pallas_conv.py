"""Pallas fused conv3d kernel: parity vs lax conv (interpret mode on CPU;
the same kernel compiles natively on TPU — see ops/pallas/conv3d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from stroke_prediction_tpu.ops.pallas.conv3d import (
    _conv3d_s2d_fwd, depth_to_space2, space_to_depth2, superpatch_weights)


def _ref(x, k, b, act="none", alpha=0.01):
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32) + b
    if act == "leaky_relu":
        y = jnp.where(y > 0, y, alpha * y)
    elif act == "elu":
        y = jnp.where(y > 0, y, alpha * (jnp.exp(y) - 1))
    return y


class TestS2dTransforms:
    def test_s2d_d2s_roundtrip(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 7, 9, 11, 3), jnp.float32)
        xs = space_to_depth2(x)
        assert xs.shape == (2, 4, 5, 6, 24)
        back = depth_to_space2(xs, (7, 9, 11))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_s2d_parity_layout(self):
        x = jnp.arange(2 * 2 * 2, dtype=jnp.float32).reshape(1, 2, 2, 2, 1)
        xs = space_to_depth2(x)
        # parity-major (pd, ph, pw): channel p = pd*4 + ph*2 + pw
        np.testing.assert_array_equal(
            np.asarray(xs[0, 0, 0, 0]), np.arange(8, dtype=np.float32))

    def test_superpatch_weights_shape(self):
        k = jnp.ones((3, 3, 3, 4, 6))
        w = superpatch_weights(k)
        assert w.shape == (64 * 4, 8 * 6)
        # density: 27 of 64 taps alive per output column
        alive = np.count_nonzero(np.asarray(w)) / w.size
        assert abs(alive - 27 / 64) < 1e-6


@pytest.mark.parametrize("shape,act", [
    ((2, 10, 14, 18, 4, 6), "leaky_relu"),
    ((1, 9, 13, 17, 2, 16), "elu"),
    ((2, 6, 10, 10, 16, 16), "none"),
])
def test_pallas_conv_matches_lax(shape, act):
    b, d, h, w, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, d, h, w, ci) - 0.5, jnp.float32)
    k = jnp.asarray(rng.rand(3, 3, 3, ci, co) - 0.5, jnp.float32) * 0.2
    bias = jnp.asarray(rng.rand(co), jnp.float32)
    ref = _ref(x, k, bias, act)
    out = _conv3d_s2d_fwd(x, k, bias, act=act, out_dtype=jnp.float32,
                          interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

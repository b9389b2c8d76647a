"""Optimizer recipe tests: torch-parity Adam+L2, MultiStepLR, β₁ ramp,
injected hyperparameters, trainable masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu.train.optim import (
    beta1_ramp, make_optimizer, multistep_lr, set_hyperparams,
    trainable_mask_by_path)


class TestSchedules:
    def test_multistep_lr(self):
        # torch MultiStepLR semantics: gamma^#{milestones <= epoch}
        s = multistep_lr(1e-3, [200, 250])
        assert s(0) == pytest.approx(1e-3)
        assert s(199) == pytest.approx(1e-3)
        assert s(200) == pytest.approx(1e-4)
        assert s(249) == pytest.approx(1e-4)
        assert s(250) == pytest.approx(1e-5)

    def test_beta1_ramp(self):
        # reference: CaeReconstructionLearner.py:28-40
        assert beta1_ramp(0.9, 0) == pytest.approx(0.5)
        assert beta1_ramp(0.9, 1) == pytest.approx(0.6)
        assert beta1_ramp(0.9, 3) == pytest.approx(0.8)
        assert beta1_ramp(0.9, 4) == pytest.approx(0.9)
        assert beta1_ramp(0.9, 100) == pytest.approx(0.9)


class TestOptimizer:
    def test_adam_l2_matches_torch_formula(self):
        # one step on a single param: grad + wd*p -> adam -> -lr update
        p = {"w": jnp.asarray([2.0])}
        g = {"w": jnp.asarray([0.5])}
        lr, wd, b1, b2, eps = 1e-2, 1e-1, 0.9, 0.999, 1e-8
        tx = make_optimizer(lr, betas=(b1, b2), weight_decay=wd, eps=eps)
        state = tx.init(p)
        updates, _ = tx.update(g, state, p)
        g_eff = 0.5 + wd * 2.0
        m_hat = g_eff           # (1-b1)*g / (1-b1)
        v_hat = g_eff ** 2
        expect = -lr * m_hat / (np.sqrt(v_hat) + eps)
        np.testing.assert_allclose(np.asarray(updates["w"]), [expect],
                                   rtol=1e-5)

    def test_injected_hyperparams_settable(self):
        p = {"w": jnp.ones(3)}
        tx = make_optimizer(1e-3, betas=(0.9, 0.999))
        state = tx.init(p)
        assert float(state.hyperparams["learning_rate"]) == pytest.approx(1e-3)
        state = set_hyperparams(state, learning_rate=5e-4, b1=0.5)
        assert float(state.hyperparams["learning_rate"]) == pytest.approx(5e-4)
        assert float(state.hyperparams["b1"]) == pytest.approx(0.5)
        # still updates fine after mutation
        g = {"w": jnp.ones(3)}
        updates, _ = tx.update(g, state, p)
        assert np.all(np.isfinite(np.asarray(updates["w"])))

    def test_trainable_mask_freezes_params(self):
        params = {"enc": {"encoder": {"k": jnp.ones(2)},
                          "step_head": {"k": jnp.ones(2)}},
                  "dec": {"k": jnp.ones(2)}}
        mask = trainable_mask_by_path(params, ("step_head",))
        assert mask["enc"]["step_head"]["k"] is True
        assert mask["enc"]["encoder"]["k"] is False
        assert mask["dec"]["k"] is False
        tx = make_optimizer(1e-3, trainable_mask=mask)
        state = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(g, state, params)
        assert float(jnp.abs(updates["enc"]["step_head"]["k"]).sum()) > 0
        assert float(jnp.abs(updates["enc"]["encoder"]["k"]).sum()) == 0
        assert float(jnp.abs(updates["dec"]["k"]).sum()) == 0

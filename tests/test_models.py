"""Golden shape tests for the valid-conv shape algebra and model forward
passes (SURVEY.md §7 'hard parts': patch 104x104x68 -> labels 64x64x28;
encoder 28x128x128 -> latent 1x10x10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu.core.dto import (
    BRANCH_BOTH, BRANCH_GTRUTH, BRANCH_INPUTS, init_cae_dto)
from stroke_prediction_tpu.models.cae3d import (
    Cae3D, Dec3D, Enc3D, Enc3DStep, cae_latent_spatial)
from stroke_prediction_tpu.models.unet3d import Unet3D, unet_output_spatial

CHANNELS_UNET = (2, 4, 6, 8, 6, 4, 6, 2)       # tiny spec, same arity as CLI
CHANNELS_CAE = (1, 2, 3, 4, 5, 6, 1)
CHANNELS_CAE_WIDE = (1, 4, 6, 8, 10, 12, 1)    # for the impl-parity check


class TestShapeAlgebra:
    def test_unet_golden_patch(self):
        # reference patch config: 104x104x68 image -> 64x64x28 labels
        assert unet_output_spatial((68, 104, 104)) == (28, 64, 64)

    def test_unet_golden_fullvolume(self):
        # padded full volume: 68x168x168 -> 28x128x128
        assert unet_output_spatial((68, 168, 168)) == (28, 128, 128)

    def test_cae_latent_golden(self):
        # encoder 28x128x128 -> latent 1x10x10 (SURVEY.md §7)
        assert cae_latent_spatial((28, 128, 128)) == (1, 10, 10)

    def test_cae_latent_small(self):
        assert cae_latent_spatial((28, 64, 64)) == (1, 2, 2)


class TestUnet3D:
    def test_forward_shapes(self):
        model = Unet3D(channels=CHANNELS_UNET)
        x = jnp.zeros((2, 44, 44, 44, 2))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(variables, x, train=False)
        d, h, w = unet_output_spatial((44, 44, 44))
        assert y.shape == (2, d, h, w, 2)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_train_mode_updates_batch_stats(self):
        model = Unet3D(channels=CHANNELS_UNET)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 44, 44, 44, 2))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y, mutated = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        assert "batch_stats" in mutated
        # running stats moved away from init zeros
        leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestLargeUnet3D:
    def test_forward_shapes(self):
        # 4-scale variant (the reference's is dead code with a broken
        # super() call; ours is the intended working version)
        from stroke_prediction_tpu.models.unet3d import LargeUnet3D
        model = LargeUnet3D(channels=(2, 3, 4, 5, 6, 5, 4, 3, 4, 2))
        x = jnp.zeros((1, 92, 92, 92, 2))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(variables, x, train=False)
        # per scale: -4 then //2 (x3), bottom -4, up: x2 then -4 (x3)
        assert y.shape == (1, 4, 4, 4, 2)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def _make_cae(step=False):
    enc_cls = Enc3DStep if step else Enc3D
    enc = enc_cls(channels=CHANNELS_CAE, n_ch_global=5, alpha=1.0)
    dec = Dec3D(channels=CHANNELS_CAE, n_ch_global=5, alpha=1.0)
    return Cae3D(enc=enc, dec=dec)


def _make_dto(b=2, spatial=(28, 64, 64), with_time=True, with_inputs=False):
    d, h, w = spatial
    k = jax.random.PRNGKey(0)
    vol = lambda: jax.random.uniform(k, (b, d, h, w, 1))
    return init_cae_dto(
        global_variables=jnp.ones((b, 5)),
        time_to_treatment=jnp.full((b, 1), 0.3) if with_time else None,
        type_core=jnp.zeros((b, 1)), type_penumbra=jnp.ones((b, 1)),
        inputs_core=vol() if with_inputs else None,
        inputs_penu=vol() if with_inputs else None,
        gtruth_core=vol(), gtruth_penumbra=vol(), gtruth_lesion=vol())


class TestCae3D:
    def test_gtruth_branch_shapes(self):
        cae = _make_cae()
        dto = _make_dto()
        variables = cae.init(jax.random.PRNGKey(0), dto, BRANCH_GTRUTH,
                             False)
        out = cae.apply(variables, dto, BRANCH_GTRUTH, False)
        lat = out.latents.gtruth
        ld, lh, lw = cae_latent_spatial((28, 64, 64))
        n_fc = CHANNELS_CAE[5]
        for z in (lat.core, lat.penu, lat.lesion, lat.interpolation):
            assert z.shape == (2, ld, lh, lw, n_fc)
        rec = out.reconstructions.gtruth
        for r in (rec.core, rec.penu, rec.lesion, rec.interpolation):
            assert r.shape == (2, 28, 64, 64, 1)
            assert float(r.min()) >= 0.0 and float(r.max()) <= 1.0
        # inputs branch untouched
        assert out.latents.inputs.core is None
        assert out.reconstructions.inputs.core is None

    def test_latent_interpolation_endpoints(self):
        cae = _make_cae()
        dto0 = _make_dto()
        dto0 = dto0.replace(given_variables=dto0.given_variables.replace(
            time_to_treatment=jnp.zeros((2, 1))))
        variables = cae.init(jax.random.PRNGKey(0), dto0, BRANCH_GTRUTH,
                             False)
        out0 = cae.apply(variables, dto0, BRANCH_GTRUTH, False)
        np.testing.assert_allclose(np.asarray(out0.latents.gtruth.interpolation),
                                   np.asarray(out0.latents.gtruth.core),
                                   rtol=1e-5)
        dto1 = dto0.replace(given_variables=dto0.given_variables.replace(
            time_to_treatment=jnp.ones((2, 1))))
        out1 = cae.apply(variables, dto1, BRANCH_GTRUTH, False)
        np.testing.assert_allclose(np.asarray(out1.latents.gtruth.interpolation),
                                   np.asarray(out1.latents.gtruth.penu),
                                   rtol=1e-5)

    def test_inputs_branch(self):
        cae = _make_cae()
        dto = _make_dto(with_inputs=True)
        variables = cae.init(jax.random.PRNGKey(0), dto, BRANCH_BOTH, False)
        out = cae.apply(variables, dto, BRANCH_BOTH, False)
        assert out.reconstructions.inputs.interpolation.shape == (2, 28, 64, 64, 1)
        assert out.reconstructions.inputs.lesion is None
        assert out.reconstructions.gtruth.lesion is not None

    def test_step_head_when_no_time(self):
        cae = _make_cae(step=True)
        dto = _make_dto(with_time=False)
        variables = cae.init(jax.random.PRNGKey(0), dto, BRANCH_GTRUTH,
                             False)
        out = cae.apply(variables, dto, BRANCH_GTRUTH, False)
        step = out.given_variables.time_to_treatment
        assert step is not None and step.shape == (2, 1)
        # near-0.5 by the crucial init (sigmoid of ~N(0.5, small))
        assert 0.3 < float(step.mean()) < 0.9
        assert out.reconstructions.gtruth.interpolation is not None


class TestS2dImplParity:
    """The chained s2d-domain conv engine (the TPU default,
    models/layers.py conv_impl) must be numerically EXACT vs the lax
    path at f32 — both stacks, training mode, batch_stats included."""

    def _run(self, monkeypatch, Stack, inp):
        from stroke_prediction_tpu.models.cae3d import (
            DecoderStack, EncoderStack)
        m = Stack(CHANNELS_CAE_WIDE, compute_dtype=jnp.float32)
        outs = {}
        for impl in ("lax2d", "pallas_s2d"):
            monkeypatch.setenv("STROKE_TPU_CONV_IMPL", impl)
            v = m.init(jax.random.PRNGKey(0), inp, train=True)
            keys = [jax.tree_util.keystr(k) for k, _ in
                    jax.tree_util.tree_leaves_with_path(v)]
            y, upd = m.apply(v, inp, train=True, mutable=["batch_stats"])
            outs[impl] = (keys, v, y, upd)
        k1, v1, y1, u1 = outs["lax2d"]
        k2, v2, y2, u2 = outs["pallas_s2d"]
        assert k1 == k2          # identical param trees -> checkpoints portable
        # re-apply s2d with the LAX params (proves same param semantics)
        monkeypatch.setenv("STROKE_TPU_CONV_IMPL", "pallas_s2d")
        y2, u2 = m.apply(v1, inp, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(y1, np.float32), np.asarray(y2, np.float32),
            atol=2e-5, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(u1),
                        jax.tree_util.tree_leaves(u2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)

    def test_encoder(self, monkeypatch):
        from stroke_prediction_tpu.models.cae3d import EncoderStack
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 28, 64, 64, 1), jnp.float32)
        self._run(monkeypatch, EncoderStack, x)

    def test_decoder(self, monkeypatch):
        from stroke_prediction_tpu.models.cae3d import DecoderStack
        rng = np.random.RandomState(1)
        z = jnp.asarray(rng.rand(1, 1, 5, 5, 6) * 0.5, jnp.float32)
        self._run(monkeypatch, DecoderStack, z)


class TestUnetS2dImplParity:
    """Full-model impl parity at f32 for both U-Net variants (the CAE
    stacks are covered above)."""

    def _check(self, monkeypatch, model, x):
        outs = {}
        for impl in ("lax2d", "pallas_s2d"):
            monkeypatch.setenv("STROKE_TPU_CONV_IMPL", impl)
            v = model.init(jax.random.PRNGKey(0), x, train=False)
            keys = [jax.tree_util.keystr(k) for k, _ in
                    jax.tree_util.tree_leaves_with_path(v)]
            outs[impl] = (keys, v)
        k1, v1 = outs["lax2d"]
        k2, _ = outs["pallas_s2d"]
        assert k1 == k2
        monkeypatch.setenv("STROKE_TPU_CONV_IMPL", "lax2d")
        y1 = model.apply(v1, x, train=False)
        monkeypatch.setenv("STROKE_TPU_CONV_IMPL", "pallas_s2d")
        y2 = model.apply(v1, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=2e-5, rtol=1e-4)

    def test_unet3d(self, monkeypatch):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 44, 44, 44, 2), jnp.float32)
        self._check(monkeypatch, Unet3D(channels=CHANNELS_UNET), x)

    def test_large_unet3d(self, monkeypatch):
        from stroke_prediction_tpu.models.unet3d import LargeUnet3D
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 92, 92, 92, 2), jnp.float32)
        self._check(monkeypatch,
                    LargeUnet3D(channels=(2, 3, 4, 5, 6, 5, 4, 3, 4, 2)), x)


def test_cae_stacks_eval_mode_parity(monkeypatch):
    """Eval mode uses BN running statistics (fold-from-stored-stats in
    the s2d path) — parity vs lax at f32 after a training step has
    moved the stats."""
    from stroke_prediction_tpu.models.cae3d import DecoderStack, EncoderStack
    rng = np.random.RandomState(2)
    for Stack, inp in (
            (EncoderStack, jnp.asarray(rng.rand(1, 28, 64, 64, 1),
                                       jnp.float32)),
            (DecoderStack, jnp.asarray(rng.rand(1, 1, 5, 5, 12) * 0.5,
                                       jnp.float32))):
        m = Stack(CHANNELS_CAE_WIDE, compute_dtype=jnp.float32)
        monkeypatch.setenv("STROKE_TPU_CONV_IMPL", "lax2d")
        v = m.init(jax.random.PRNGKey(0), inp, train=True)
        # move the running stats off their init values
        _, upd = m.apply(v, inp, train=True, mutable=["batch_stats"])
        v = {**v, "batch_stats": upd["batch_stats"]}
        y1 = m.apply(v, inp, train=False)
        monkeypatch.setenv("STROKE_TPU_CONV_IMPL", "pallas_s2d")
        y2 = m.apply(v, inp, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=Stack.__name__)


def test_cae_structure_batching_matches_sequential(monkeypatch):
    """The group-stacked batched encoder/decoder passes (cae3d.py
    _encode_many/_decode_many) must reproduce the sequential
    per-structure passes exactly: identical reconstructions AND identical
    BN running-stat updates (grouped stats + chained momentum updates in
    structure order)."""
    cae = _make_cae()
    dto = _make_dto(b=2)
    variables = cae.init(jax.random.PRNGKey(0), dto, BRANCH_GTRUTH, False)

    def run(enabled):
        monkeypatch.setenv("STROKE_TPU_CAE_BATCH", "1" if enabled else "0")
        # (batching is opt-in: measured slower on the s2d engine, see
        # cae3d.structure_batching; the equivalence must hold regardless)
        return cae.apply(variables, dto, BRANCH_GTRUTH, True,
                         mutable=["batch_stats"])

    o_seq, m_seq = run(False)
    o_bat, m_bat = run(True)
    for name in ("core", "penu", "lesion", "interpolation"):
        a = np.asarray(getattr(o_seq.reconstructions.gtruth, name))
        b = np.asarray(getattr(o_bat.reconstructions.gtruth, name))
        np.testing.assert_allclose(a, b, atol=2e-5, err_msg=name)
    for a, b in zip(jax.tree_util.tree_leaves(m_seq["batch_stats"]),
                    jax.tree_util.tree_leaves(m_bat["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

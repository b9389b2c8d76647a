"""Small-unit coverage: profiling StepTimer, loader drop_last, checkpoint
round trip incl. optimizer state."""

import time

import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, MOD_CBV, StrokeDataset3D, SyntheticCaseProvider)
from stroke_prediction_tpu.data.loader import BatchLoader
from stroke_prediction_tpu.train.checkpoint import (
    load_checkpoint, save_checkpoint)
from stroke_prediction_tpu.train.optim import make_optimizer
from stroke_prediction_tpu.utils.profiling import StepTimer


class TestStepTimer:
    def test_warmup_excluded_and_rate(self):
        t = StepTimer(warmup_steps=1, n_chips=2)
        for i in range(3):
            t.start()
            time.sleep(0.01)
            t.stop(n_volumes=4)
        # 2 timed steps, 8 volumes, >= 20ms, 2 chips
        assert 0 < t.volumes_per_sec_per_chip < 4 / 0.01
        assert "volumes/sec/chip" in t.summary()


class TestLoader:
    def test_drop_last(self):
        provider = SyntheticCaseProvider(n_cases=5, shape_xyz=(8, 8, 8),
                                         seed=0)
        ds = StrokeDataset3D(provider, [MOD_CBV], [LABEL_CORE])
        keep = BatchLoader(ds, range(5), batch_size=2, seed=0)
        drop = BatchLoader(ds, range(5), batch_size=2, seed=0,
                           drop_last=True)
        assert len(keep) == 3 and len(drop) == 2
        assert sum(len(b["case_id"]) for b in keep) == 5
        assert sum(len(b["case_id"]) for b in drop) == 4


class TestCheckpointRoundTrip:
    def test_params_and_opt_state(self, tmp_path):
        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
        tx = make_optimizer(1e-3)
        opt_state = tx.init(params)
        p1 = str(tmp_path / "m.model")
        save_checkpoint(p1, {"params": params}, {"kind": "unet3d",
                                                 "channels": [1, 2]})
        p2 = str(tmp_path / "m.optim")
        save_checkpoint(p2, {"opt_state": opt_state})

        state, cfg = load_checkpoint(p1)
        assert cfg == {"kind": "unet3d", "channels": [1, 2]}
        np.testing.assert_array_equal(state["params"]["w"],
                                      np.asarray(params["w"]))

        from flax import serialization
        raw, _ = load_checkpoint(p2)
        restored = serialization.from_state_dict(opt_state,
                                                 raw["opt_state"])
        # hyperparams restored
        assert abs(float(restored.hyperparams["learning_rate"]) - 1e-3) < 1e-9

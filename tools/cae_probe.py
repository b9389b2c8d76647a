"""Component-level timing of the CAE reconstruction step on TPU
(config of record 1 16 24 32 100 200 1, batch 4, 28x128x128) — where do
the ~87-106 ms go?  Run: python tools/cae_probe.py [batch_mode]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
if len(sys.argv) > 1:
    os.environ["STROKE_TPU_CAE_BATCH"] = sys.argv[1]

import jax
import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.core.dto import BRANCH_GTRUTH
from stroke_prediction_tpu.inference import cae_dto_from_batch
from stroke_prediction_tpu.models.cae3d import (
    Cae3D, Dec3D, DecoderStack, Enc3D, EncoderStack)

CH = (1, 16, 24, 32, 100, 200, 1)
B = 4
DTYPE = jnp.bfloat16


def timed(fn, *args, n=10, label=""):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    tn = time.perf_counter() - t0
    per = (tn - t1) / (n - 1)
    print(f"{label:46s} {per*1e3:8.2f} ms", flush=True)
    return per


def main():
    rng = np.random.RandomState(0)
    mode = os.environ.get("STROKE_TPU_CAE_BATCH", "1")
    print(f"STROKE_TPU_CAE_BATCH={mode}")

    enc_stack = EncoderStack(CH, compute_dtype=DTYPE)
    dec_stack = DecoderStack(CH, compute_dtype=DTYPE)
    x1 = jnp.asarray(rng.rand(B, 28, 128, 128, 1), jnp.float32)
    ev = enc_stack.init(jax.random.PRNGKey(0), x1, train=False)
    lat = enc_stack.apply(ev, x1, train=False)
    dv = dec_stack.init(jax.random.PRNGKey(1), lat, train=False)
    print("latent:", lat.shape)

    # single-structure passes
    f_enc = jax.jit(lambda v, x: enc_stack.apply(v, x, train=True,
                                                 mutable=["batch_stats"]))
    f_dec = jax.jit(lambda v, z: dec_stack.apply(v, z, train=True,
                                                 mutable=["batch_stats"]))
    timed(f_enc, ev, x1, label=f"enc fwd (B={B})")
    timed(f_dec, dv, lat, label=f"dec fwd (B={B})")
    x3 = jnp.concatenate([x1] * 3, 0)
    lat4 = jnp.concatenate([lat] * 4, 0)
    f_enc3 = jax.jit(lambda v, x: enc_stack.apply(
        v, x, train=True, groups=3, mutable=["batch_stats"]))
    f_dec4 = jax.jit(lambda v, z: dec_stack.apply(
        v, z, train=True, groups=4, mutable=["batch_stats"]))
    timed(f_enc3, ev, x3, label=f"enc fwd grouped (B={3*B}, G=3)")
    timed(f_dec4, dv, lat4, label=f"dec fwd grouped (B={4*B}, G=4)")

    # gradients
    g_enc = jax.jit(jax.grad(lambda v, x: jnp.sum(enc_stack.apply(
        v, x, train=True, mutable=["batch_stats"])[0]
        .astype(jnp.float32)), argnums=0))
    g_dec = jax.jit(jax.grad(lambda v, z: jnp.sum(dec_stack.apply(
        v, z, train=True, mutable=["batch_stats"])[0]
        .astype(jnp.float32)), argnums=0))
    timed(g_enc, {"params": ev["params"],
                  "batch_stats": ev["batch_stats"]}, x1,
          label=f"enc grad (B={B})")
    timed(g_dec, {"params": dv["params"],
                  "batch_stats": dv["batch_stats"]}, lat,
          label=f"dec grad (B={B})")

    # full model step fwd
    cae = Cae3D(enc=Enc3D(channels=CH, compute_dtype=DTYPE),
                dec=Dec3D(channels=CH, compute_dtype=DTYPE))
    labels = jnp.asarray((rng.rand(B, 28, 128, 128, 3) > 0.7), jnp.float32)
    clin = jnp.asarray(rng.rand(B, 5), jnp.float32)
    dto = cae_dto_from_batch(None, labels, clin)
    cv = cae.init(jax.random.PRNGKey(0), dto, BRANCH_GTRUTH, False)
    f_full = jax.jit(lambda v, d: cae.apply(v, d, BRANCH_GTRUTH, True,
                                            mutable=["batch_stats"]))
    def first_rec(out):
        return out[0].reconstructions.gtruth.interpolation
    fw = jax.jit(lambda v, d: first_rec(f_full(v, d)))
    timed(fw, cv, dto, label="full CAE fwd (3 enc + 4 dec)")


if __name__ == "__main__":
    main()

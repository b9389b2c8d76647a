"""Per-op forward/grad timings for the CAE decoder's constituent ops at
their real geometries (config of record, batch 4) — locates the
backward-pass hot spots that make the step bwd-dominated
(tools/cae_probe.py: dec grad 12.8 ms vs dec fwd 4.0 ms).

Run on TPU: python tools/cae_probe2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.ops.pallas.s2d import (
    ct_stride2_to_s2d, s2d_conv, s2d_conv1x1, s2d_pack, s2d_unpack)

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
    print(f"{label:52s} {per*1e3:8.2f} ms", flush=True)
    return per


def probe_conv(name, shape_dhw, cin, cout, mode="s"):
    rng = np.random.RandomState(0)
    d, h, w = shape_dhw
    x = jnp.asarray(rng.rand(B, d, h, w, cin), DTYPE)
    s = jax.jit(s2d_pack)(x)
    k = jnp.asarray(rng.rand(3, 3, 3, cin, cout) - 0.5, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    modes = (mode, "v", "v")

    def f(cells, k):
        from stroke_prediction_tpu.ops.pallas.s2d import S2d
        ss = S2d(cells, s.logical)
        return jnp.sum(s2d_conv(ss, k, bias, act="elu", alpha=1.0,
                                modes=modes).cells.astype(jnp.float32))

    timed(jax.jit(lambda c, k: f(c, k)), s.cells, k,
          label=f"{name} fwd")
    timed(jax.jit(jax.grad(f, argnums=(0, 1))), s.cells, k,
          label=f"{name} grad")


def probe_ct(name, shape_dhw, cin, cout, ksz):
    rng = np.random.RandomState(0)
    d, h, w = shape_dhw
    x = jnp.asarray(rng.rand(B, d, h, w, cin), DTYPE)
    k = jnp.asarray(rng.rand(ksz, ksz, ksz, cin, cout) - 0.5, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def f(x, k):
        return jnp.sum(ct_stride2_to_s2d(x, k, bias, act="elu",
                                         alpha=1.0).cells
                       .astype(jnp.float32))

    timed(jax.jit(f), x, k, label=f"{name} fwd")
    timed(jax.jit(jax.grad(f, argnums=(0, 1))), x, k,
          label=f"{name} grad")


def probe_1x1(name, shape_dhw, cin, cout):
    rng = np.random.RandomState(0)
    d, h, w = shape_dhw
    x = jnp.asarray(rng.rand(B, d, h, w, cin), DTYPE)
    s = jax.jit(s2d_pack)(x)
    k = jnp.asarray(rng.rand(cin, cout) - 0.5, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def f(cells, k):
        from stroke_prediction_tpu.ops.pallas.s2d import S2d
        ss = S2d(cells, s.logical)
        return jnp.sum(s2d_conv1x1(ss, k, bias, "elu", 1.0).cells
                       .astype(jnp.float32))

    timed(jax.jit(lambda c, k: f(c, k)), s.cells, k, label=f"{name} fwd")
    timed(jax.jit(jax.grad(f, argnums=(0, 1))), s.cells, k,
          label=f"{name} grad")


def main():
    # decoder geometry chain for (1, 16, 24, 32, 100, 200, 1), input
    # latent (1, 10, 10, 200):
    #   ct3 s1 (logical lax) -> (3,12,12,100)
    #   ct3 s2 -> cells of (7,25,25,32) ; two pad-(1,2,2) convs 32->32->24
    #   ct2 s2 -> cells of (14,50,50,24); two convs 24->24->16
    #   ct2 s2 -> cells of (28,100,100,16)... (real: 28,128,128 chain)
    # full-res stage at the real output size:
    probe_ct("ct2x2 s2 16ch (14,64,64)->(28,128,128)",
             (14, 64, 64), 16, 16, 2)
    probe_conv("conv3 s-mode 16->16 @ (28,128,128)",
               (28, 128, 128), 16, 16)
    probe_conv("conv3 s-mode 16->16 @ (28,128,128) 2nd",
               (28, 128, 128), 16, 16)
    probe_1x1("conv1 16->16 @ (28,128,128)", (28, 128, 128), 16, 16)
    probe_1x1("conv1 16->1 @ (28,128,128)", (28, 128, 128), 16, 1)
    # mid stage
    probe_ct("ct2x2 s2 24ch (7,32,32)->(14,64,64)", (7, 32, 32), 24, 24, 2)
    probe_conv("conv3 s-mode 24->24 @ (14,64,64)", (14, 64, 64), 24, 24)
    # low stage
    probe_ct("ct3x3 s2 32ch (3,15,15)->cells", (3, 15, 15), 100, 32, 3)
    probe_conv("conv3 s-mode 32->32 @ (7,31,31)", (7, 31, 31), 32, 32)
    # encoder full-res pair
    probe_conv("enc conv3 s-mode 1->16 @ (28,128,128)",
               (28, 128, 128), 1, 16)
    probe_conv("enc conv3 s-mode 16->16 @ (28,128,128)",
               (28, 128, 128), 16, 16)


if __name__ == "__main__":
    main()

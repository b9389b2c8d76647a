"""Per-op forward/grad timings for the U-Net s2d step at the config of
record (channels 2 16 32 64 32 16 32 2, batch 6, patch 104x104x68) —
fresh decomposition of the ~37 ms step.  Run on TPU:
python tools/unet_probe.py
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
    S2d, s2d_conv, s2d_conv1x1, s2d_pack, s2d_pool2, s2d_unpack,
    s2d_concat_channels, s2d_center_crop_cells, upsample2x_to_s2d)

B = 6
DTYPE = jnp.bfloat16


def timed(fn, *args, n=15, label=""):
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
    print(f"{label:50s} {per*1e3:8.2f} ms", flush=True)
    return per


def make_cells(shape_dhw, c, seed=0):
    rng = np.random.RandomState(seed)
    d, h, w = shape_dhw
    x = jnp.asarray(rng.rand(B, d, h, w, c), DTYPE)
    return jax.jit(s2d_pack)(x)


def probe_conv(name, shape_dhw, cin, cout):
    s = make_cells(shape_dhw, cin)
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.rand(3, 3, 3, cin, cout) - 0.5, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def f(cells, k):
        ss = S2d(cells, s.logical)
        return jnp.sum(s2d_conv(ss, k, bias, act="leaky_relu", alpha=0.01)
                       .cells.astype(jnp.float32))

    tf = timed(jax.jit(lambda c, kk: f(c, kk)), s.cells, k,
               label=f"{name} fwd")
    tg = timed(jax.jit(jax.grad(f, argnums=(0, 1))), s.cells, k,
               label=f"{name} grad")
    return tf, tg


def main():
    total = 0.0
    # entry pack at the PATCH size
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.rand(B, 68, 104, 104, 2), DTYPE)
    total += timed(jax.jit(s2d_pack), xp, label="L1 entry pack (patch)")
    total += timed(jax.jit(jax.grad(lambda v: jnp.sum(
        s2d_pack(v).cells.astype(jnp.float32) ** 2))), xp,
        label="L1 entry pack grad")

    for args in (("L1a 2->16 @68x104x104", (68, 104, 104), 2, 16),
                 ("L1b 16->16 @66x102x102", (66, 102, 102), 16, 16),
                 ("L2a 16->32 @32x50x50", (32, 50, 50), 16, 32),
                 ("L2b 32->32 @30x48x48", (30, 48, 48), 32, 32),
                 ("L3a 32->64 @14x23x23", (14, 23, 23), 32, 64),
                 ("L3b 64->64 @12x21x21", (12, 21, 21), 64, 64),
                 ("U1a 96->32 @20x38x38", (20, 38, 38), 96, 32),
                 ("U1b 32->32 @18x36x36", (18, 36, 36), 32, 32),
                 ("U2a 48->16 @32x68x68", (32, 68, 68), 48, 16),
                 ("U2b 16->16 @30x66x66", (30, 66, 66), 16, 16)):
        tf, tg = probe_conv(*args)
        total += tf + tg

    # pool+pack seams
    s1 = make_cells((64, 100, 100), 16)
    total += timed(jax.jit(lambda s: s2d_pack(s2d_pool2(s))), s1,
                   label="pool2+pack L1->L2")
    total += timed(jax.jit(jax.grad(lambda c: jnp.sum(s2d_pack(
        s2d_pool2(S2d(c, s1.logical))).cells.astype(jnp.float32) ** 2))),
        s1.cells, label="pool2+pack L1->L2 grad")
    s2 = make_cells((28, 46, 46), 32)
    total += timed(jax.jit(lambda s: s2d_pack(s2d_pool2(s))), s2,
                   label="pool2+pack L2->L3")

    # upsample-to-cells + in-cell skip concat
    r3 = jnp.asarray(np.random.RandomState(3).rand(B, 10, 19, 19, 64),
                     DTYPE)
    sk = make_cells((30, 48, 48), 32)

    def upcat(r_low, skc):
        u = upsample2x_to_s2d(r_low)
        skip = s2d_center_crop_cells(S2d(skc, sk.logical), u.logical[:3])
        return s2d_concat_channels(u, skip).cells

    total += timed(jax.jit(lambda a, b: jnp.sum(
        upcat(a, b).astype(jnp.float32))), r3, sk.cells,
        label="up+concat L3->U1")
    total += timed(jax.jit(jax.grad(lambda a, b: jnp.sum(
        upcat(a, b).astype(jnp.float32)), argnums=(0, 1))), r3, sk.cells,
        label="up+concat L3->U1 grad")

    # heads
    sh = make_cells((28, 64, 64), 16)
    k1 = jnp.asarray(np.random.RandomState(4).rand(16, 32) - .5, jnp.float32)
    k2 = jnp.asarray(np.random.RandomState(5).rand(32, 2) - .5, jnp.float32)

    def heads(c, k1, k2):
        ss = S2d(c, sh.logical)
        h = s2d_conv1x1(ss, k1, jnp.zeros((32,), jnp.float32),
                        "leaky_relu", 0.01)
        h = s2d_conv1x1(h, k2, jnp.zeros((2,), jnp.float32), "none", 0.0)
        return jnp.sum(s2d_unpack(h).astype(jnp.float32))

    total += timed(jax.jit(heads), sh.cells, k1, k2, label="heads fwd")
    total += timed(jax.jit(jax.grad(heads, argnums=(0, 1, 2))), sh.cells,
                   k1, k2, label="heads grad")
    print(f"{'SUM of pieces':50s} {total*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

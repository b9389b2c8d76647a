"""Component-level timing probe for the U-Net train step on TPU.

Times are anchored on host fetches (the axon tunnel defers execution past
block_until_ready).  Run: python tools/perf_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.models.unet3d import Unet3D
from stroke_prediction_tpu.models.layers import BnConvActBlock
from stroke_prediction_tpu.ops import max_pool3d, upsample2x_trilinear
from stroke_prediction_tpu.eval.metrics import batch_dice_loss

BATCH = 6
SHAPE = (BATCH, 68, 104, 104, 2)
DTYPE = jnp.bfloat16


def timed(fn, *args, n=10, label=""):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # warm + materialize
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    tn = time.perf_counter() - t0
    per = (tn - t1) / (n - 1) if n > 1 else tn
    print(f"{label:40s} {per*1e3:8.2f} ms")
    return per


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*SHAPE), jnp.float32)
    model = Unet3D(channels=(2, 16, 32, 64, 32, 16, 32, 2),
                   compute_dtype=DTYPE)
    variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)
    params = variables["params"]
    bs = variables["batch_stats"]

    fwd = jax.jit(lambda p, xx: model.apply(
        {"params": p, "batch_stats": bs}, xx, train=False))
    timed(fwd, params, x, label="U-Net forward (eval)")

    fwd_t = jax.jit(lambda p, xx: model.apply(
        {"params": p, "batch_stats": bs}, xx, train=True,
        mutable=["batch_stats"])[0])
    timed(fwd_t, params, x, label="U-Net forward (train BN)")

    y = jnp.asarray((rng.rand(BATCH, 28, 64, 64, 2) > 0.7), jnp.float32)

    def loss(p, xx):
        seg, _ = model.apply({"params": p, "batch_stats": bs}, xx,
                             train=True, mutable=["batch_stats"])
        return (batch_dice_loss(seg[..., 0:1], y[..., 0:1])
                + batch_dice_loss(seg[..., 1:2], y[..., 1:2])) / 2

    gradf = jax.jit(jax.grad(loss))
    timed(gradf, params, x, label="U-Net fwd+bwd")

    # individual pieces
    blk = BnConvActBlock(16, compute_dtype=DTYPE)
    bv = blk.init(jax.random.PRNGKey(0), x, False)
    f = jax.jit(lambda v, xx: blk.apply(v, xx, False))
    timed(f, bv, x, label="block1a conv 2->16 @104^2x68")

    blk2 = BnConvActBlock(16, compute_dtype=DTYPE)
    x16 = jnp.zeros((BATCH, 66, 102, 102, 16), jnp.float32)
    bv2 = blk2.init(jax.random.PRNGKey(0), x16, False)
    f2 = jax.jit(lambda v, xx: blk2.apply(v, xx, False))
    timed(f2, bv2, x16, label="block1b conv 16->16 @102^2x66")

    up = jax.jit(upsample2x_trilinear)
    xup = jnp.zeros((BATCH, 10, 19, 19, 64), DTYPE)
    timed(up, xup, label="upsample2x 19^2x10x64")
    xup2 = jnp.zeros((BATCH, 24, 42, 42, 32), DTYPE)
    timed(up, xup2, label="upsample2x 42^2x24x32")

    mp = jax.jit(max_pool3d)
    x1 = jnp.zeros((BATCH, 64, 100, 100, 16), DTYPE)
    timed(mp, x1, label="maxpool 100^2x64x16")

    # conv without BN for comparison
    from stroke_prediction_tpu.models.layers import Conv3d
    c = Conv3d(16, compute_dtype=DTYPE)
    cv = c.init(jax.random.PRNGKey(0), x16)
    fc = jax.jit(lambda v, xx: c.apply(v, xx))
    timed(fc, cv, x16.astype(DTYPE), label="bare conv 16->16 @102^2x66")


if __name__ == "__main__":
    main()

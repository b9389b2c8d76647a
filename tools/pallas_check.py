"""On-TPU check of the s2d-domain Pallas conv engine: correctness vs lax
(forward AND backward) and per-shape timing.  Run from /root/repo with the
default (axon) platform:

    python tools/pallas_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stroke_prediction_tpu.ops.pallas.s2d import (
    s2d_conv, s2d_pack, s2d_unpack)


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(f, *a, n=10):
    o = f(*a)
    _ = fetch(o)
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(*a)
    _ = fetch(o)
    return (time.perf_counter() - t0) / n, o


def ref_conv(x, k, b, act, alpha, zpad, dtype=jnp.bfloat16):
    if zpad:
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32) + b
    if act == "leaky_relu":
        y = jnp.where(y > 0, y, alpha * y)
    elif act == "elu":
        y = jnp.where(y > 0, y, alpha * (jnp.exp(y) - 1))
    return y


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.RandomState(0)
    # (label, B, D, H, W, Ci, Co, act, zpad) — U-Net L1/L2 + CAE shapes
    cases = [
        ("unet_L1", 6, 68, 104, 104, 16, 16, "leaky_relu", False),
        ("unet_L2", 6, 32, 50, 50, 32, 32, "leaky_relu", False),
        ("cae_enc1", 4, 28, 128, 128, 16, 16, "elu", True),
        ("cae_enc2", 4, 14, 62, 62, 24, 24, "elu", True),
    ]
    for label, b, d, h, w, ci, co, act, zpad in cases:
        x = jnp.asarray(rng.rand(b, d, h, w, ci) - 0.5, jnp.float32)
        k = jnp.asarray((rng.rand(3, 3, 3, ci, co) - 0.5) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.rand(co), jnp.float32)
        modes = ("s", "v", "v") if zpad else ("v", "v", "v")

        def f_s2d(x, k, bias):
            s = s2d_conv(s2d_pack(x.astype(jnp.bfloat16)), k, bias,
                         act=act, modes=modes)
            return s2d_unpack(s)

        def loss_s2d(x, k, bias):
            return jnp.sum(f_s2d(x, k, bias).astype(jnp.float32) ** 2)

        def loss_ref(x, k, bias):
            # f32 for the grad reference: the bf16 conv's transpose rule
            # rejects the f32 cotangent
            return jnp.sum(
                ref_conv(x, k, bias, act, 0.01, zpad, jnp.float32) ** 2)

        jf = jax.jit(f_s2d)
        jr = jax.jit(lambda x, k, b: ref_conv(x, k, b, act, 0.01, zpad))
        t_s2d, y1 = timed(jf, x, k, bias)
        t_ref, y2 = timed(jr, x, k, bias)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2)))
        scale = float(jnp.max(jnp.abs(y2))) + 1e-6

        jg = jax.jit(jax.grad(loss_s2d, argnums=(1, 2)))
        jgr = jax.jit(jax.grad(loss_ref, argnums=(1, 2)))
        tg_s2d, g1 = timed(lambda *a: jg(*a)[0], x, k, bias, n=5)
        tg_ref, g2 = timed(lambda *a: jgr(*a)[0], x, k, bias, n=5)
        gerr = float(jnp.max(jnp.abs(g1 - g2))) / (
            float(jnp.max(jnp.abs(g2))) + 1e-6)

        status = "OK " if err / scale < 2e-2 and gerr < 5e-2 else "FAIL"
        print(f"{status} {label:10s} fwd {t_s2d * 1e3:7.2f} ms "
              f"(lax {t_ref * 1e3:7.2f})  relerr {err / scale:.2e}   "
              f"grad {tg_s2d * 1e3:7.2f} ms (lax {tg_ref * 1e3:7.2f})  "
              f"relerr {gerr:.2e}")


if __name__ == "__main__":
    main()

"""On-TPU check of the Pallas fused conv3d kernel: correctness vs lax and
per-shape timing.  Run from /root/repo with the default (axon) platform:

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

from stroke_prediction_tpu.ops.pallas.conv3d import _conv3d_s2d_fwd


def timed(f, *a, n=10):
    o = f(*a)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    o = f(*a)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(*a)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    tn = time.perf_counter() - t0
    return (tn - t1) / (n - 1)


def main():
    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}")
    for (b, d, h, w, ci, co) in [(2, 10, 18, 22, 16, 16),
                                 (6, 66, 102, 102, 16, 16),
                                 (6, 32, 50, 50, 16, 32)]:
        x = jnp.asarray(rng.rand(b, d, h, w, ci) - 0.5, jnp.float32)
        k = jnp.asarray(rng.rand(3, 3, 3, ci, co) - 0.5, jnp.float32) * 0.2
        bias = jnp.asarray(rng.rand(co), jnp.float32)
        ref = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1, 1),
            "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32) + bias
        ref = jnp.where(ref > 0, ref, 0.01 * ref)
        out = _conv3d_s2d_fwd(x, k, bias, act="leaky_relu",
                              out_dtype=jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref)))
        fp = jax.jit(lambda x, k, b: _conv3d_s2d_fwd(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), b,
            act="leaky_relu"))
        t = timed(fp, x, k, bias)
        gf = 2 * b * (d - 2) * (h - 2) * (w - 2) * 27 * ci * co / 1e9
        print(f"{(b, d, h, w, ci, co)}: maxerr {err:.4f}  "
              f"{t * 1e3:6.2f} ms  {gf / t / 1e3:5.1f} TF/s useful")


if __name__ == "__main__":
    main()

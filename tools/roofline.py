"""Per-kernel roofline for the s2d conv engine on TPU (round-3 verdict
item 3: "time vs ideal gemm time for each backward kernel at both
configs").

For every 3^3 conv layer of the two headline configs this times, on the
real chip:

  * fwd        — the forward pallas pass alone
  * bwd dW     — the backward with ``input_grad=False`` (db + dW kernel)
  * bwd dx+dW  — the full fused backward
  * XLA conv   — lax.conv_general_dilated fwd+bwd on the LOGICAL layout
                 at the same shape (the do-nothing alternative)

and prints each against two idealized bounds:

  * gemm bound — the time the s2d pass' actual MXU work would take at
    peak: 2 * B * grid_d * nq * M * K * N FLOPs over the REAL padded
    lane shapes, at V5E_BF16_TFLOPS.
  * HBM bound  — bytes moved by the pass (operand reads incl. the nz
    halo re-reads, output writes) at V5E_HBM_GBS.

A pass at ~max(gemm, hbm) is at its speed-of-light; the gap column is
measured / bound.  Run: python tools/roofline.py [unet|cae|all]
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
    S2d, _cells, _round_up, s2d_conv, s2d_pack)

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 820.0
DTYPE = jnp.bfloat16


def timed(fn, *args, n=20):
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
    return (tn - t1) / (n - 1)


def bounds(b, dhw, cin, cout, modes):
    """(gemm_fwd_ms, hbm_fwd_ms, gemm_bwd_ms, hbm_bwd_ms) for the s2d
    pass at its REAL padded shapes (the engine's speed-of-light, not the
    27*Cin*Cout true-FLOP ideal — the lane packing's intrinsic padding
    is part of the design and is reported separately)."""
    d, h, w = dhw
    do = d - 2 if modes[0] == "v" else d
    ho, wo = h - 2, w - 2
    dco, hco, hci = _cells(do), _cells(ho), _cells(h)
    wcp = _round_up(_cells(w), 8)
    c8 = _round_up(8 * cin, 128)
    co8 = _round_up(8 * cout, 128)
    nz = 2 if modes[0] == "v" else 3
    nq = nz * 4
    esz = 2  # bf16

    # fwd: grid (b, dco); per step nq matmuls (hco*wcp, c8)@(c8, co8)
    gemm_fwd = 2.0 * b * dco * nq * (hco * wcp) * c8 * co8
    # reads: nz x-blocks per step + weights (small); writes: y
    hbm_fwd = esz * b * (dco * nz * hci * wcp * c8 + dco * hco * wcp * co8)

    # bwd fused: grid (b, dzi); dx dual conv (hci*wpi rows, co8 -> c8)
    # + dW nq gemms (hco*wcx rows, c8 x co8); plus the XLA prep pass
    # (mask+dact+pad: read g + y, write gpad) and the db reduction.
    dzi = _cells(d)
    wpi = wcp  # cell-padded cotangent width ~ wcp
    gemm_dx = 2.0 * b * dzi * nq * (hci * wpi) * co8 * c8
    gemm_dw = 2.0 * b * dco * nq * (hco * wcp) * c8 * co8
    g_bytes = b * dco * hco * wcp * co8 * esz
    x_bytes = b * dzi * hci * wcp * c8 * esz
    hbm_bwd = (
        2 * g_bytes + g_bytes            # prep: read g + y, write gpad
        + nz * g_bytes                   # kernel: gpad halo reads
        + nz * x_bytes                   # kernel: x halo reads
        + x_bytes)                       # dx write
    return (gemm_fwd / V5E_BF16_TFLOPS / 1e9,
            hbm_fwd / V5E_HBM_GBS / 1e6,
            (gemm_dx + gemm_dw) / V5E_BF16_TFLOPS / 1e9,
            hbm_bwd / V5E_HBM_GBS / 1e6)


def true_flops_ms(b, dhw, cin, cout, modes, factor):
    d, h, w = dhw
    do = d - 2 if modes[0] == "v" else d
    return (factor * 2.0 * b * do * (h - 2) * (w - 2) * 27 * cin * cout
            / V5E_BF16_TFLOPS / 1e9)


def probe(name, b, dhw, cin, cout, modes=("v", "v", "v"), act="leaky_relu"):
    rng = np.random.RandomState(0)
    d, h, w = dhw
    x = jnp.asarray(rng.rand(b, d, h, w, cin) * 2 - 1, DTYPE)
    s = jax.jit(s2d_pack)(x)
    k = jnp.asarray(rng.rand(3, 3, 3, cin, cout) - 0.5, jnp.float32)
    bias = jnp.asarray(rng.rand(cout) - 0.5, jnp.float32)

    def f(cells, k, bias, input_grad=True):
        ss = S2d(cells, s.logical)
        out = s2d_conv(ss, k, bias, modes=modes, act=act, alpha=0.01,
                       input_grad=input_grad)
        return jnp.sum(out.cells.astype(jnp.float32) ** 2)

    t_fwd = timed(jax.jit(lambda c, kk, bb: f(c, kk, bb)), s.cells, k, bias)
    t_dw = timed(jax.jit(jax.grad(
        lambda c, kk, bb: f(c, kk, bb, input_grad=False),
        argnums=(1, 2))), s.cells, k, bias)
    t_full = timed(jax.jit(jax.grad(f, argnums=(0, 1, 2))), s.cells, k, bias)

    # XLA baseline on the logical layout (VALID; z-same via explicit pad)
    pad = ((1, 1), (0, 0), (0, 0)) if modes[0] == "s" else "VALID"
    kb = k.astype(DTYPE)

    def g(xl, kk):
        y = jax.lax.conv_general_dilated(
            xl, kk, (1, 1, 1), pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    t_xf = timed(jax.jit(g), x, kb)
    t_xg = timed(jax.jit(jax.grad(g, argnums=(0, 1))), x, kb)

    gf, hf, gb, hb = bounds(b, dhw, cin, cout, modes)
    bf = max(gf, hf)
    bb_ = max(gb, hb)
    tf_ms, tdw_ms, tfull_ms = t_fwd * 1e3, t_dw * 1e3, t_full * 1e3
    print(f"{name:26s} fwd {tf_ms:7.3f} (bound {bf:6.3f} "
          f"g{gf:6.3f}/h{hf:6.3f}, x{tf_ms/bf:4.1f}) "
          f"dW {tdw_ms:7.3f} full {tfull_ms:7.3f} "
          f"(bound {bb_:6.3f} g{gb:6.3f}/h{hb:6.3f}, x{tfull_ms/bb_:4.1f}) "
          f"| XLA f{t_xf*1e3:7.3f} g{t_xg*1e3:7.3f} "
          f"| true-mxu f{true_flops_ms(b, dhw, cin, cout, modes, 1):6.3f} "
          f"b{true_flops_ms(b, dhw, cin, cout, modes, 2):6.3f}",
          flush=True)
    return tf_ms, tfull_ms


UNET = [  # (name, b, (d, h, w), cin, cout)
    ("U L1a 2->16 @68x104", 6, (68, 104, 104), 2, 16),
    ("U L1b 16->16 @66x102", 6, (66, 102, 102), 16, 16),
    ("U L2a 16->32 @32x50", 6, (32, 50, 50), 16, 32),
    ("U L2b 32->32 @30x48", 6, (30, 48, 48), 32, 32),
    ("U L3a 32->64 @14x23", 6, (14, 23, 23), 32, 64),
    ("U L3b 64->64 @12x21", 6, (12, 21, 21), 64, 64),
    ("U U1a 96->32 @20x38", 6, (20, 38, 38), 96, 32),
    ("U U1b 32->32 @18x36", 6, (18, 36, 36), 32, 32),
    ("U U2a 48->16 @32x68", 6, (32, 68, 68), 48, 16),
    ("U U2b 16->16 @30x66", 6, (30, 66, 66), 16, 16),
]

# CAE encoder (z-SAME convs) + decoder full-res convs; enc runs 3x and
# dec 4x per step (gtruth/core/penu branches; 4 decodes)
CAE = [
    ("C E1a 1->16 @28x128 zs", 4, (28, 128, 128), 1, 16, ("s", "v", "v")),
    ("C E1b 16->16 @28x126 zs", 4, (28, 126, 126), 16, 16, ("s", "v", "v")),
    ("C E2a 16->24 @14x62 zs", 4, (14, 62, 62), 16, 24, ("s", "v", "v")),
    ("C E2b 24->24 @14x60 zs", 4, (14, 60, 60), 24, 24, ("s", "v", "v")),
    ("C D3a 24->16 @28x120 zs", 4, (28, 120, 120), 24, 16, ("s", "v", "v")),
    ("C D3b 16->16 @28x118 zs", 4, (28, 118, 118), 16, 16, ("s", "v", "v")),
]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}  (ms; bound = max(gemm, hbm) of the "
          f"s2d pass at padded lane shapes; x = measured/bound)")
    if which in ("unet", "all"):
        for row in UNET:
            probe(*row)
    if which in ("cae", "all"):
        for row in CAE:
            probe(*row[:5], modes=row[5])


if __name__ == "__main__":
    main()

#!/bin/bash
# Round-4 JAX-side (TPU) parity queue, sequential: the reference-length
# CAE run (config of record: 300 epochs, lrsteps 200 250 — reference
# README.md:33), the two JAX-side CAE seed replicates that make the
# 35-epoch CAE noise band two-sided (round-3 verdict Missing #2/#4),
# and the second converged U-Net pair's JAX leg (fold set 5..24,
# 200 epochs — verdict item 7).  The torch sides run concurrently
# (CPU, nice 10).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
F0="0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19"
F5="5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24"

run() {
  local name="$1"; shift
  if [ -f "parity/${name}.json.done" ]; then echo "skip ${name}"; return; fi
  echo "[queue] start ${name} $(date)"
  # keep the axon sitecustomize on PYTHONPATH — it registers the TPU
  # tunnel backend; replacing PYTHONPATH wholesale silently lands on CPU
  env -u JAX_PLATFORMS PYTHONPATH=/root/.axon_site:/root/repo \
    python tools/parity_jax.py "$@" --out "parity/${name}.json" \
    > "parity/${name}.log" 2>&1 \
    && touch "parity/${name}.json.done"
  echo "[queue] done ${name} $(date)"
}

run cae_fold0_e300_jax  --config cae --epochs 300 --lrsteps 200 250 \
    --seed 4 --fold $F0
run cae_fold0_jax_seed5 --config cae --epochs 35 --seed 5 --fold $F0
run cae_fold0_jax_seed6 --config cae --epochs 35 --seed 6 --fold $F0
run unet_fold5_e200_jax --config unet --epochs 200 --seed 4 --fold $F5
echo "[queue] ALL DONE $(date)"

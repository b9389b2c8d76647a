#!/bin/bash
# Round-5 JAX-side (TPU) parity queue: the second converged CAE fold
# set's JAX leg (fold 9.., reference budget — round-4 verdict item 6;
# the torch side is infeasible inside one round on the 1-core host, see
# NOTES.md round-5 §4) and a third converged-budget seed replicate to
# widen the JAX converged band.
set -u
cd /root/repo
F9="9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24 25 26 27 28"
F0="0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19"
run() {
  local name="$1"; shift
  if [ -f "parity/${name}.json.done" ]; then echo "skip ${name}"; return; fi
  echo "[queue] start ${name} $(date)"
  env -u JAX_PLATFORMS PYTHONPATH=/root/.axon_site:/root/repo \
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
    python tools/parity_jax.py "$@" --out "parity/${name}.json" \
    > "parity/${name}.log" 2>&1 \
    && touch "parity/${name}.json.done"
  echo "[queue] done ${name} $(date)"
}
run cae_fold9_e300_jax      --config cae --epochs 300 --lrsteps 200 250 \
    --seed 4 --fold $F9
run cae_fold0_e300_jax_seed6 --config cae --epochs 300 --lrsteps 200 250 \
    --seed 6 --fold $F0
echo "[queue] ALL DONE $(date)"

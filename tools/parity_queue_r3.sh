#!/bin/bash
# Round-3 torch-side parity queue (sequential; single-core host).
# Produces the two-sided seed-noise band + the reference-length (200-epoch)
# torch run that VERDICT.md round-2 items 1a/1b demand.
set -u
cd /root/repo
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
F0="0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19"

run() {
  local name="$1"; shift
  if [ -f "parity/${name}.json.done" ]; then echo "skip ${name}"; return; fi
  echo "[queue] start ${name} $(date)"
  nice -n 10 env -u PYTHONPATH PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python tools/parity_torch.py "$@" --out "parity/${name}.json" \
    > "parity/${name}.log" 2>&1 \
    && touch "parity/${name}.json.done"
  echo "[queue] done ${name} $(date)"
}

run unet_fold0_s5_torch  --config unet --epochs 35  --seed 5 --fold $F0
run unet_fold0_s6_torch  --config unet --epochs 35  --seed 6 --fold $F0
run unet_fold0_e200_torch --config unet --epochs 200 --seed 4 --fold $F0
run cae_fold0_s5_torch   --config cae  --epochs 35  --seed 5 --fold $F0
run cae_fold0_s6_torch   --config cae  --epochs 35  --seed 6 --fold $F0
echo "[queue] ALL DONE $(date)"

#!/bin/bash
# Round-3h: extend the real-Foodcom-scale parity table (VERDICT r2 item 2)
# from {LightGCN, BM3} to ALL SIX models — torch ref side, CPU-only, so it
# runs through the axon-tunnel outage. Fixed-15-epoch protocol, seed 999,
# same FoodcomStruct fixture (7,596 x 29,943, 500 negatives).
# Waits for the running pytest suite first (1-core box: never overlap the
# torch campaign with the test suite). Ours side is seconds per run on the
# TPU once the tunnel is back: run_parity_r3h_scale_ours.sh.
set -u
cd /root/repo
mkdir -p log/parity_r3

if [ -f /tmp/pytest_r3h.pid ]; then
  while kill -0 "$(cat /tmp/pytest_r3h.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout "$to" python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run scale999_CIKM   21600 --model CIKM_Model    --epochs 15 --scale foodcom --seeds 999
run scale999_SCHGN  14400 --model SCHGN         --epochs 15 --scale foodcom --seeds 999
run scale999_FGCN   14400 --model FGCN          --epochs 15 --scale foodcom --seeds 999
run scale999_PRICAI 14400 --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 999
echo R3H_REF_ALL_DONE

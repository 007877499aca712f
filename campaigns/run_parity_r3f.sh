#!/bin/bash
# Round-3f: shrink the two noisiest error bars in the 5-seed table by
# doubling FGCN and BM3 to 10 best-upon-valid seeds (998-1007). These are
# the cheapest models per seed on BOTH sides (measured r3d: BM3 ref ES
# ~75s/seed, FGCN ref ES ~2-4 min/seed; ours ~1-3 min/seed on the chip),
# and their stds (3.60 / 1.67) dominate the table's uncertainty.
# Phase 1: ours side (TPU) for seeds 1003-1007; phase 2: torch ref side
# (CPU, axon-bypassed) + free full-10-seed aggregates.
set -u
cd /root/repo
mkdir -p log/parity_r3
S_NEW=1003,1004,1005,1006,1007
S_ALL=998,999,1000,1001,1002,$S_NEW

run_ours() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10800 python -u parity_check.py --side ours "$@" \
    > "log/parity_r3/${name}_ours.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}
run_ref() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout 18000 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run_ours es3f_FGCN --model FGCN --epochs 100 --early_stop --seeds $S_NEW
run_ours es3f_BM3  --model BM3  --epochs 100 --early_stop --seeds $S_NEW
run_ref  es3f_FGCN --model FGCN --epochs 100 --early_stop --seeds $S_ALL
run_ref  es3f_BM3  --model BM3  --epochs 100 --early_stop --seeds $S_ALL
echo ALL_R3F_DONE

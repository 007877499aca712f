#!/bin/bash
# Ref-first phase of r3f + r3e (TPU-tunnel outage): run every pending
# torch job now on the idle CPU, caching per-seed results; the ours side
# and the free delta/aggregate passes happen after tunnel recovery.
# Shortest-first; one torch job at a time.
set -u
cd /root/repo
mkdir -p log/parity_r3
S_NEW=1003,1004,1005,1006,1007

run_ref() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout 18000 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run_ref es3f_BM3_first  --model BM3  --epochs 100 --early_stop --seeds $S_NEW
run_ref es3f_FGCN_first --model FGCN --epochs 100 --early_stop --seeds $S_NEW
run_ref scale998_LightGCN_first --model LightGCN --epochs 15 \
    --scale foodcom --seeds 998
run_ref scale998_BM3_first --model BM3 --epochs 15 \
    --scale foodcom --seeds 998
echo ALL_REF_FIRST_DONE

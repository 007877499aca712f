#!/bin/bash
# Round-3c parity campaign, OURS side (TPU): extend every remaining model
# to 5 best-upon-valid seeds (998-1002) and Mirror Gradient to 3 seeds.
#   * CIKM_Model / SCHGN (both interleave modes) / BM3 / PRICAI_ModelX:
#     add seeds 1001,1002 (998-1000 cached from r3 / r2 campaigns)
#   * MG LightGCN fixed-30: add seed 998 (999,1000 cached)
# Split-phase (--side ours) as in run_parity_r3_ours.sh.
set -u
cd /root/repo
mkdir -p log/parity_r3

run() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10800 python -u parity_check.py --side ours "$@" \
    > "log/parity_r3/${name}_ours.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run es3c_SCHGN_faithful --model SCHGN --epochs 100 --early_stop \
    --seeds 1001,1002 --set schgn_faithful_interleave=True
run es3c_SCHGN  --model SCHGN --epochs 100 --early_stop --seeds 1001,1002
run es3c_CIKM   --model CIKM_Model --epochs 100 --early_stop --seeds 1001,1002
run es3c_BM3    --model BM3 --epochs 100 --early_stop --seeds 1001,1002
run es3c_PRICAI --model PRICAI_ModelX --epochs 100 --early_stop --seeds 1002
run mg3c_LightGCN --model LightGCN --epochs 30 --mg --seeds 998
echo ALL_OURS_DONE

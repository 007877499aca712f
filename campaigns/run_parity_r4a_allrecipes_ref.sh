#!/bin/bash
# Round-4a: accuracy parity at REAL Allrecipes scale (BASELINE.md: 68,768
# users / 45,630 items / ~677k train interactions / 500 eval negatives) —
# the last accuracy axis of the driver target ("±0.5% Recall@20/NDCG@20 on
# Allrecipes and Foodcom"); round 3 proved Foodcom scale, Allrecipes has
# only speed numbers so far.
#
# torch ref side, CPU-only (runs through tunnel outages). Costs on this
# 1-core box, extrapolated from the Foodcom-scale fixed-15 measurements
# (LightGCN 74min, BM3 94min at 190k inters; Allrecipes is ~3.5x the
# interactions and 1.5x the items): LightGCN ~4-5h, BM3 ~6-7h. Launch
# FIRST THING in the round; ours side (TPU, minutes) pairs via
# run_parity_r4a_allrecipes_ours.sh.
# Usage: nohup bash run_parity_r4a_allrecipes_ref.sh > /tmp/r4a_ref.log 2>&1 &
#        echo $! > /tmp/r4a_ref.pid
set -u
cd /root/repo
mkdir -p log/parity_r4

run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout "$to" python -u parity_check.py --side ref "$@" \
    > "log/parity_r4/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

# dataset generation happens inside the first run (cached on disk after);
# budget it into the first timeout
run allrec999_LightGCN 28800 --model LightGCN --epochs 15 --scale allrecipes --seeds 999
run allrec999_BM3      32400 --model BM3      --epochs 15 --scale allrecipes --seeds 999
echo R4A_REF_ALL_DONE

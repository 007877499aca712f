#!/bin/bash
# Round-4c ours-only seed widening at REAL dataset scales (TPU side only —
# the 1-core host CPU stays dedicated to the in-flight torch ref queue).
# Purpose: ours-side variance at scale. The at-scale ref points are
# necessarily single-seed (74min-4.2h each on this box); pairing them with
# an ours mean+-std over >=3 seeds makes the single ref draw interpretable
# (is the delta inside ours' own seed scatter?). Also: first at-scale eval
# metrics for SCHGN/FGCN/PRICAI (so far they only have at-scale epoch
# times, bench_zoo_*.json).
# Everything runs nice -n 19 and serialized; datasets + compile caches are
# already warm from r3h/r4a/r4b, so host CPU cost is minutes total.
# Usage: nohup nice -n 19 bash run_parity_r4c_ours_seeds.sh > /tmp/r4c_ours.log 2>&1 &
#        echo $! > /tmp/r4c_ours.pid
set -u
cd /root/repo
mkdir -p log/parity_r4

probe_tunnel() {
  while true; do
    if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then break; fi
    sleep 180
  done
}

run_ours() {
  name="$1"; shift
  probe_tunnel
  echo "=== $name (ours): $* === $(date +%H:%M:%S)"
  timeout 7200 nice -n 19 python -u parity_check.py --side ours "$@" \
    > "log/parity_r4/${name}_ours.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

# Foodcom scale: widen the paired models to 4 ours seeds (998-1000 + 1001)
for seed in 1000 1001; do
  run_ours "cikm${seed}_foodcom" --model CIKM_Model --epochs 15 --scale foodcom --seeds "$seed"
  run_ours "lgcn${seed}_foodcom" --model LightGCN   --epochs 15 --scale foodcom --seeds "$seed"
  run_ours "bm3${seed}_foodcom"  --model BM3        --epochs 15 --scale foodcom --seeds "$seed"
done

# Foodcom scale: first at-scale eval metrics for the remaining three
run_ours schgn999_foodcom  --model SCHGN         --epochs 15 --scale foodcom --seeds 999
run_ours fgcn999_foodcom   --model FGCN          --epochs 15 --scale foodcom --seeds 999
run_ours pricai999_foodcom --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 999

# Allrecipes scale: ours seed spread around the single ref point (999)
run_ours allrec998_LightGCN  --model LightGCN --epochs 15 --scale allrecipes --seeds 998
run_ours allrec1000_LightGCN --model LightGCN --epochs 15 --scale allrecipes --seeds 1000
# BM3 at Allrecipes: the ref side was dropped (6-7h > round budget), but
# ours-side metrics at full Allrecipes dimensions are still evidence the
# model evaluates sanely at scale (minutes on one chip)
run_ours allrec999_BM3 --model BM3 --epochs 15 --scale allrecipes --seeds 999
echo R4C_OURS_ALL_DONE

#!/bin/bash
# Round-4d ours-only seed widening, part 2 (TPU side; waits for the r4c
# queue to drain so only one TPU process runs at a time).
# Purpose: every at-scale parity point gets an ours-side mean±std over
# >=3 seeds (5 where the ref pairing exists), so the necessarily
# single-seed torch-CPU ref points are interpretable against ours' own
# seed scatter. All datasets + compile caches are warm; each Foodcom run
# is ~3-4 min, Allrecipes ~10 min on one chip.
# Usage: nohup nice -n 19 bash run_parity_r4d_ours_seeds.sh > /tmp/r4d_ours.log 2>&1 &
#        echo $! > /tmp/r4d_ours.pid
set -u
cd /root/repo
mkdir -p log/parity_r4

echo "waiting for r4c queue to drain... $(date +%H:%M:%S)"
while ! grep -q R4C_OURS_ALL_DONE /tmp/r4c_ours.log 2>/dev/null; do sleep 60; done
echo "r4c done $(date +%H:%M:%S)"

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

# flagship first: 5 ours seeds at Foodcom scale around the (in-flight) ref point
run_ours cikm998_foodcom  --model CIKM_Model --epochs 15 --scale foodcom --seeds 998
run_ours cikm1002_foodcom --model CIKM_Model --epochs 15 --scale foodcom --seeds 1002
# complete the paired models to 5 ours seeds
run_ours lgcn1002_foodcom --model LightGCN --epochs 15 --scale foodcom --seeds 1002
run_ours bm31002_foodcom  --model BM3      --epochs 15 --scale foodcom --seeds 1002
# 3 ours seeds for the ours-only at-scale rows
run_ours schgn998_foodcom  --model SCHGN --epochs 15 --scale foodcom --seeds 998
run_ours schgn1000_foodcom --model SCHGN --epochs 15 --scale foodcom --seeds 1000
run_ours fgcn998_foodcom   --model FGCN  --epochs 15 --scale foodcom --seeds 998
run_ours fgcn1000_foodcom  --model FGCN  --epochs 15 --scale foodcom --seeds 1000
run_ours pricai998_foodcom  --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 998
run_ours pricai1000_foodcom --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 1000
# second ours seed for the (unpaired) BM3 Allrecipes point
run_ours allrec998_BM3 --model BM3 --epochs 15 --scale allrecipes --seeds 998
echo R4D_OURS_ALL_DONE

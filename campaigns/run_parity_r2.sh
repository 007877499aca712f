#!/bin/bash
# Round-2 parity campaign (VERDICT items 2+3): re-measure ALL models with the
# fixed harness (scipy dok_matrix._update shim routes through __setitem__ —
# round-1 reference numbers were measured against a zeroed graph).
# Sequential: box has 1 CPU + 1 TPU chip.
set -u
cd /root/repo
mkdir -p log/parity_r2

run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 10800 python parity_check.py "$@" > "log/parity_r2/$name.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

# Phase 1: fixed-epoch 30, seed 999, all six models
for M in LightGCN CIKM_Model BM3 SCHGN FGCN PRICAI_ModelX; do
  run "fix30_$M" --model "$M" --epochs 30 --seed 999
done

# Phase 2: best-upon-valid, LightGCN x3 seeds (VERDICT item 2)
run es_LightGCN --model LightGCN --epochs 100 --early_stop --seeds 998,999,1000

# Phase 3: best-upon-valid, remaining models, seed 999
for M in CIKM_Model BM3 SCHGN FGCN PRICAI_ModelX; do
  run "es_$M" --model "$M" --epochs 100 --early_stop --seed 999
done
echo ALL_DONE

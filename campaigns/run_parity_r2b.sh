#!/bin/bash
# Round-2 parity campaign, part B: extra seeds for models whose single-seed
# delta exceeded |0.5%| NDCG@20, to separate seed noise from systematic gaps.
set -u
cd /root/repo
mkdir -p log/parity_r2

run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 10800 python parity_check.py "$@" > "log/parity_r2/$name.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run es_LightGCN_b --model LightGCN --epochs 100 --early_stop --seeds 1001,1002
run es_BM3_b --model BM3 --epochs 100 --early_stop --seeds 998,1000
run fix30_PRICAI_b --model PRICAI_ModelX --epochs 30 --seeds 998,1000
run es_PRICAI_b --model PRICAI_ModelX --epochs 100 --early_stop --seeds 998
echo ALL_DONE_B

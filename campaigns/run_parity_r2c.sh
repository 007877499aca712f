#!/bin/bash
# PRICAI root-cause runs: more ES seeds + loss_cl ablation (fixed-30).
set -u
cd /root/repo
mkdir -p log/parity_r2
run() { name="$1"; shift; echo "=== $name ==="; timeout 10800 python parity_check.py "$@" > "log/parity_r2/$name.log" 2>&1; echo "rc=$? $name done $(date +%H:%M:%S)"; }
run es_PRICAI_c --model PRICAI_ModelX --epochs 100 --early_stop --seeds 1000,1001
run fix30_PRICAI_nocl --model PRICAI_ModelX --epochs 30 --seeds 998,999,1000 --set loss_cl=0
echo ALL_DONE_C

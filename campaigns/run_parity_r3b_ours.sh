#!/bin/bash
# Round-3 follow-up parity campaign, OURS side (TPU): FGCN seed widening
# (1001/1002 -> 5 best-upon-valid seeds) and a mess_dropout=0 ablation to
# attribute the FGCN delta (VERDICT r2 item 1: root-cause any >1% mean;
# tests/test_fgcn_full_parity.py pins the loss surface as identical, so the
# remaining candidates are the dropout stochastic path vs seed scatter at
# FGCN's low absolute operating point).
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

run es_FGCN_more --model FGCN --epochs 100 --early_stop --seeds 1001,1002
run es_FGCN_nodrop --model FGCN --epochs 100 --early_stop \
    --seeds 998,999,1000 --set mess_dropout=0.0
echo ALL_OURS_B_DONE

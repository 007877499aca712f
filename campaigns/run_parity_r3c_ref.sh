#!/bin/bash
# Round-3c parity campaign, REFERENCE side (torch CPU; JAX_PLATFORMS=cpu).
# Waits on the ours-side cache files from run_parity_r3c_ours.sh, then
# runs the torch side for the new seeds and finishes with free aggregate
# passes over the full 5-seed sets (everything cached by then).
set -u
cd /root/repo
mkdir -p log/parity_r3
RES=/tmp/foodrec_parity/results

wait_for() {
  for f in "$@"; do
    n=0
    while [ ! -f "$RES/$f" ]; do
      sleep 30
      n=$((n + 30))
      if [ $n -ge 21600 ]; then echo "TIMEOUT waiting for $f"; return 1; fi
    done
  done
}

run() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  JAX_PLATFORMS=cpu timeout 18000 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

FT=es_schgn_faithful_interleave=True
wait_for "SCHGN_1001_${FT}.json" "SCHGN_1002_${FT}.json"
run es3c_SCHGN_faithful --model SCHGN --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002 --set schgn_faithful_interleave=True

wait_for SCHGN_1001_es.json SCHGN_1002_es.json
run es3c_SCHGN  --model SCHGN --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002

wait_for CIKM_Model_1001_es.json CIKM_Model_1002_es.json
run es3c_CIKM   --model CIKM_Model --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002

wait_for BM3_1001_es.json BM3_1002_es.json
run es3c_BM3    --model BM3 --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002

wait_for PRICAI_ModelX_1002_es.json
run es3c_PRICAI --model PRICAI_ModelX --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002

wait_for LightGCN_998_fix30_mg1.00.23.json
run mg3c_LightGCN --model LightGCN --epochs 30 --mg --seeds 998,999,1000
echo ALL_REF_DONE

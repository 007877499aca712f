#!/bin/bash
# Round-3 parity campaign, REFERENCE side (torch CPU; JAX_PLATFORMS=cpu so
# the metric kernels run on host and the TPU stays free). Each run waits
# for the ours-side cache files written by run_parity_r3_ours.sh, trains
# the torch side, and prints deltas. Ref-side results are cached too
# (ref_*.json), so the final aggregate passes are free and the SCHGN
# faithful-vs-fixed A/B reuses one set of torch runs.
set -u
cd /root/repo
mkdir -p log/parity_r3
RES=/tmp/foodrec_parity/results

# wait_for <file...>: poll until every ours-side cache file exists
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
wait_for "SCHGN_998_${FT}.json" "SCHGN_999_${FT}.json" "SCHGN_1000_${FT}.json"
run es_SCHGN_faithful --model SCHGN --epochs 100 --early_stop \
    --seeds 998,999,1000 --set schgn_faithful_interleave=True

wait_for SCHGN_998_es.json SCHGN_1000_es.json
run es_SCHGN  --model SCHGN --epochs 100 --early_stop --seeds 998,999,1000

wait_for CIKM_Model_998_es.json CIKM_Model_1000_es.json
run es_CIKM   --model CIKM_Model --epochs 100 --early_stop --seeds 998,999,1000

wait_for FGCN_998_es.json FGCN_1000_es.json
run es_FGCN   --model FGCN --epochs 100 --early_stop --seeds 998,999,1000

wait_for LightGCN_999_fix30_mg1.00.23.json LightGCN_1000_fix30_mg1.00.23.json
run mg_LightGCN --model LightGCN --epochs 30 --mg --seeds 999,1000

wait_for LightGCN_999_fix15_foodcom.json
run scale_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 999

wait_for BM3_999_fix15_foodcom.json
run scale_BM3 --model BM3 --epochs 15 --scale foodcom --seeds 999

# free aggregate passes over the full (now fully cached) seed sets
run agg_LightGCN --model LightGCN --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002
run agg_BM3      --model BM3 --epochs 100 --early_stop --seeds 998,999,1000
run agg_PRICAI   --model PRICAI_ModelX --epochs 100 --early_stop \
    --seeds 998,999,1000,1001
echo ALL_REF_DONE

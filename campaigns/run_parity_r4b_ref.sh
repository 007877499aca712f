#!/bin/bash
# Round-4b torch-ref queue (replaces the back half of run_parity_r4a_allrecipes_ref.sh):
# after the in-flight LightGCN Allrecipes-scale run writes its cache, spend
# the remaining 1-core CPU budget on
#   1. CIKM_Model (flagship) fixed-15 at REAL Foodcom scale — the named
#      "HealthRec on Foodcom" BASELINE.json config has speed numbers but no
#      at-scale accuracy parity yet (torch cost: 15 x 1,006s/epoch = 4.2h,
#      bench_baseline.json).
#   2/3. second seeds (998) for the existing Foodcom-scale LightGCN/BM3
#      parity points (74/94 min each) — whatever still fits the round.
# BM3-Allrecipes (6-7h) was dropped: a partial run is unusable because the
# /tmp result caches do not survive the round's container.
# Usage: nohup bash run_parity_r4b_ref.sh > /tmp/r4b_ref.log 2>&1 &
#        echo $! > /tmp/r4b_ref.pid
set -u
cd /root/repo
mkdir -p log/parity_r4
RES=/tmp/foodrec_parity/results

run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout "$to" python -u parity_check.py --side ref "$@" \
    > "log/parity_r4/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

echo "waiting for the in-flight LightGCN Allrecipes ref run... $(date +%H:%M:%S)"
while [ ! -f "$RES/ref_LightGCN_999_fix15_allrecipes.json" ]; do sleep 300; done
echo "LightGCN allrec cache present $(date +%H:%M:%S)"

run cikm999_foodcom 21600 --model CIKM_Model --epochs 15 --scale foodcom --seeds 999
run lgcn998_foodcom 10800 --model LightGCN   --epochs 15 --scale foodcom --seeds 998
run bm3998_foodcom  10800 --model BM3        --epochs 15 --scale foodcom --seeds 998
echo R4B_REF_ALL_DONE

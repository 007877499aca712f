#!/bin/bash
# Round-5 torch-ref queue (fresh container: /tmp caches were reseeded from
# parity_results/ so completed runs are skipped). Priority order:
#   1. CIKM_Model (flagship) fixed-15 at REAL Foodcom scale, seed 999 —
#      the one at-scale accuracy point the flagship still lacks
#      (torch cost ~4.2h: 15 x 1,006s/epoch, bench_baseline.json).
#   2. LightGCN fixed-15 at REAL Allrecipes scale, seed 999 — first
#      ref-side accuracy point on the second real dataset (~4-5h incl.
#      one-time dataset generation).
#   3/4. seed-1000 widening for the Foodcom-scale LightGCN/BM3 points
#      (74/94 min each) — whatever still fits the round.
# Usage: nohup bash run_r5_ref.sh > /tmp/r5_ref.log 2>&1 &
set -u
cd /root/repo
mkdir -p log/parity_r5

run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout "$to" python -u parity_check.py --side ref "$@" \
    > "log/parity_r5/${name}_ref.log" 2>&1
  rc=$?
  echo "rc=$rc $name done $(date +%H:%M:%S)"
  return $rc
}

run cikm999_foodcom   21600 --model CIKM_Model --epochs 15 --scale foodcom    --seeds 999 \
  && echo R5_REF_CIKM_DONE  # marker gated on rc=0 (ADVICE r3)
run lgcn999_allrec    28800 --model LightGCN   --epochs 15 --scale allrecipes --seeds 999 \
  && echo R5_REF_ALLREC_DONE
run lgcn1000_foodcom  10800 --model LightGCN   --epochs 15 --scale foodcom    --seeds 1000
run bm31000_foodcom   10800 --model BM3        --epochs 15 --scale foodcom    --seeds 1000
echo R5_REF_ALL_DONE

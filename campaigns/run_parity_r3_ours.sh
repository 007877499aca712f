#!/bin/bash
# Round-3 parity campaign, OURS side (TPU). VERDICT r2 items 1/2/6:
#   * >=3 best-upon-valid seeds for CIKM_Model / SCHGN / FGCN (999 cached
#     from r2; these runs add 998 + 1000)
#   * SCHGN faithful-interleave A/B (3 seeds) to attribute the +2.24%
#   * Mirror Gradient parity, LightGCN fixed-30, 2 seeds
#   * real-Foodcom-scale fixed-epoch parity for LightGCN + BM3
# Split-phase (--side ours) so the slow torch side runs on CPU while the
# TPU side populates the cache (run_parity_r3_ref.sh waits on cache files).
# Run order matches the ref script so the CPU side never starves.
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

run es_SCHGN_faithful --model SCHGN --epochs 100 --early_stop \
    --seeds 998,999,1000 --set schgn_faithful_interleave=True
run es_SCHGN  --model SCHGN --epochs 100 --early_stop --seeds 998,1000
run es_CIKM   --model CIKM_Model --epochs 100 --early_stop --seeds 998,1000
run es_FGCN   --model FGCN --epochs 100 --early_stop --seeds 998,1000
run mg_LightGCN --model LightGCN --epochs 30 --mg --seeds 999,1000
run scale_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 999
run scale_BM3 --model BM3 --epochs 15 --scale foodcom --seeds 999
echo ALL_OURS_DONE

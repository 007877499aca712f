#!/bin/bash
# Round-3j combined TPU-recovery chain — supersedes run_r3g_tpu_recovery.sh
# and run_parity_r3h_scale_ours.sh (their poll loops were killed when this
# launched). Reordering rationale: r3h_ours waited for R3G_ALL_DONE, which
# put the ~2h Foodcom-XL optimizer A/B BEFORE the minutes-cheap scale999
# parity runs; with the tunnel down since 04:40 the recovery window may be
# short, so everything fast-and-high-value runs first.
#   1. scale998 LightGCN/BM3 ours          (completes 2-seed scale rows)
#   2. FGCN/BM3 early-stop seeds 1003-1007 (10-seed toy rows)
#   3. scale999 CIKM/SCHGN/FGCN/PRICAI ours (6-model scale table)
#   4. bench.py sanity (gates + warms .jax_cache for the driver)
#   5. free cache-hit aggregates (wait for the torch ref chain's caches)
#   6. tools/xl_rowsparse_ab.py (675M-param optimizer A/B, ~2h)
# One TPU job at a time; torch ref chain (run_parity_r3h_scale_ref.sh)
# keeps the CPU and is untouched.
set -u
cd /root/repo
mkdir -p log/parity_r3
RES=/tmp/foodrec_parity/results

echo "probing tunnel... $(date +%H:%M:%S)"
while true; do
  if timeout 60 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "tunnel back $(date +%H:%M:%S)"
    break
  fi
  sleep 120
done

run_ours() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10800 python -u parity_check.py --side ours "$@" \
    > "log/parity_r3/${name}_ours.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}
run_agg() {
  name="$1"; ref_cache="$2"; shift 2
  while [ -n "$ref_cache" ] && [ ! -f "$RES/$ref_cache" ]; do sleep 180; done
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout 3600 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

# 1-2: the r3g backlog, fast runs only
run_ours scale998_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 998
run_ours scale998_BM3      --model BM3      --epochs 15 --scale foodcom --seeds 998
run_ours es3f_FGCN --model FGCN --epochs 100 --early_stop --seeds 1003,1004,1005,1006,1007
run_ours es3f_BM3  --model BM3  --epochs 100 --early_stop --seeds 1003,1004,1005,1006,1007

# 3: the r3h backlog (ours side is independent of the ref caches)
run_ours scale999_CIKM   --model CIKM_Model    --epochs 15 --scale foodcom --seeds 999
run_ours scale999_SCHGN  --model SCHGN         --epochs 15 --scale foodcom --seeds 999
run_ours scale999_FGCN   --model FGCN          --epochs 15 --scale foodcom --seeds 999
run_ours scale999_PRICAI --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 999

# 4: aggregates whose caches are already complete (both sides)
run_agg agg3g_FGCN_10seed "" --model FGCN --epochs 100 --early_stop --seeds 998,999,1000,1001,1002,1003,1004,1005,1006,1007
run_agg agg3g_BM3_10seed  "" --model BM3  --epochs 100 --early_stop --seeds 998,999,1000,1001,1002,1003,1004,1005,1006,1007
run_agg agg3g_scale_LightGCN "" --model LightGCN --epochs 15 --scale foodcom --seeds 998,999
run_agg agg3g_scale_BM3      "" --model BM3      --epochs 15 --scale foodcom --seeds 998,999

# 5: bench sanity — gates must be green and the driver's cache warm
echo "=== bench sanity === $(date +%H:%M:%S)"
timeout 2400 python bench.py > /tmp/bench_r3_final.log 2>&1
echo "rc=$? bench done $(date +%H:%M:%S): $(tail -1 /tmp/bench_r3_final.log)"

# 6: the long TPU tail
echo "=== xl_rowsparse_ab === $(date +%H:%M:%S)"
timeout 7200 python -u tools/xl_rowsparse_ab.py > /tmp/xl_ab.log 2>&1
echo "rc=$? xl_ab done $(date +%H:%M:%S)"

# 7: aggregates gated on the torch ref chain (CIKM ~17:30, then
# SCHGN/FGCN/PRICAI through the evening) — CPU cache-hit passes, free
run_agg agg3h_scale_CIKM   ref_CIKM_Model_999_fix15_foodcom.json    --model CIKM_Model    --epochs 15 --scale foodcom --seeds 999
run_agg agg3h_scale_SCHGN  ref_SCHGN_999_fix15_foodcom.json         --model SCHGN         --epochs 15 --scale foodcom --seeds 999
run_agg agg3h_scale_FGCN   ref_FGCN_999_fix15_foodcom.json          --model FGCN          --epochs 15 --scale foodcom --seeds 999
run_agg agg3h_scale_PRICAI ref_PRICAI_ModelX_999_fix15_foodcom.json --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 999
echo R3J_ALL_DONE

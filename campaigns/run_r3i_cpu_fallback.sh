#!/bin/bash
# Round-3i CONTINGENCY: ours-side parity runs on CPU, for use only if the
# axon tunnel stays down past ~22:00 (down since 04:40 on 2026-08-18).
# The ref side of every pending point is already cached or in flight
# (run_parity_r3h_scale_ref.sh); this recovers the OURS side without the
# TPU so the round still lands its parity tables. JAX-on-CPU runs the
# identical program — results overwrite into the same cache files and a
# later TPU pass (run_r3g_tpu_recovery.sh) would simply recompute them.
#
# LAUNCH MANUALLY, and only after:
#   1. killing the TPU pollers:  kill $(cat /tmp/r3g.pid /tmp/r3h_ours.pid)
#   2. confirming the torch ref chain has finished or been accepted as a
#      CPU co-tenant (this script waits for it by default — 1-core box).
# Usage: nohup bash run_r3i_cpu_fallback.sh > /tmp/r3i.log 2>&1 &
#        echo $! > /tmp/r3i.pid
set -u
cd /root/repo
mkdir -p log/parity_r3
RES=/tmp/foodrec_parity/results
CPU="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"

# never contend with the torch ref chain for the single core
if [ -f /tmp/r3h_ref.pid ]; then
  while kill -0 "$(cat /tmp/r3h_ref.pid)" 2>/dev/null; do sleep 180; done
fi
echo "ref chain clear $(date +%H:%M:%S)"

# last chance: if the tunnel recovered, the TPU chains are the right path
if timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; then
  echo "tunnel is UP — aborting CPU fallback; restart run_r3g_tpu_recovery.sh instead"
  exit 0
fi
echo "tunnel still down — running ours-side on CPU $(date +%H:%M:%S)"

run_ours_cpu() {
  name="$1"; to="$2"; shift 2
  echo "=== $name (CPU): $* === $(date +%H:%M:%S)"
  $CPU OMP_NUM_THREADS=1 timeout "$to" python -u parity_check.py \
    --side ours "$@" > "log/parity_r3/${name}_ours.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}
run_agg() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  $CPU OMP_NUM_THREADS=1 timeout 3600 python -u parity_check.py \
    --side ref "$@" > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

# value order, cheapest-on-CPU first
# 1. toy-scale early-stop seeds 1003-1007 -> unlocks the 10-seed rows
run_ours_cpu es3f_FGCN 14400 --model FGCN --epochs 100 --early_stop --seeds 1003,1004,1005,1006,1007
run_agg agg3g_FGCN_10seed --model FGCN --epochs 100 --early_stop --seeds 998,999,1000,1001,1002,1003,1004,1005,1006,1007
run_ours_cpu es3f_BM3 14400 --model BM3 --epochs 100 --early_stop --seeds 1003,1004,1005,1006,1007
run_agg agg3g_BM3_10seed --model BM3 --epochs 100 --early_stop --seeds 998,999,1000,1001,1002,1003,1004,1005,1006,1007

# 2. Foodcom-scale seed 998 (completes the 2-seed scale rows)
run_ours_cpu scale998_LightGCN 14400 --model LightGCN --epochs 15 --scale foodcom --seeds 998
run_agg agg3g_scale_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 998,999
run_ours_cpu scale998_BM3 14400 --model BM3 --epochs 15 --scale foodcom --seeds 998
run_agg agg3g_scale_BM3 --model BM3 --epochs 15 --scale foodcom --seeds 998,999

# 3. Foodcom-scale seed 999 for the four r3h models, cheapest first —
#    each gated on its ref cache existing (the r3h ref chain writes them)
scale999() {
  model="$1"; to="$2"; ref="$RES/ref_${model}_999_fix15_foodcom.json"
  if [ -f "$RES/${model}_999_fix15_foodcom.json" ]; then
    echo "skip scale999_$model (ours cache already present — keep the TPU result)"
  elif [ -f "$ref" ]; then
    run_ours_cpu "scale999_${model}" "$to" --model "$model" --epochs 15 --scale foodcom --seeds 999
    run_agg "agg3h_scale_${model}" --model "$model" --epochs 15 --scale foodcom --seeds 999
  else
    echo "skip scale999_$model (ref cache absent)"
  fi
}
scale999 LightGCN 14400   # no-op if already cached via earlier rounds
scale999 FGCN 18000
scale999 PRICAI_ModelX 18000
scale999 SCHGN 21600
scale999 CIKM_Model 21600
echo R3I_ALL_DONE

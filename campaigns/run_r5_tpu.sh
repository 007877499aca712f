#!/bin/bash
# Round-5 TPU queue (nice 19: the torch-ref chain owns the single host
# core; TPU work is device-bound). Revalidates the ROW_PANEL 256->128
# SpMM geometry change end to end and finishes ours-side at-scale seeds:
#   1. bench.py at Foodcom scale — re-warms the (fresh-container) compile
#      cache AND re-runs both correctness gates with the new geometry.
#   2/3. whole-zoo epoch-time sweep at both real scales (updates
#      bench_zoo_{foodcom,allrecipes}.json).
#   4. bench.py at Allrecipes scale.
#   5/6. SCHGN at-scale parity seeds 1001/1002 (pin the fix-15 bimodality
#      rate: seed 999 stalls at AUC 0.63, 998/1000 reach 0.92).
#   7. BM3 Allrecipes ours seed 1000 (third seed for that point).
# Usage: nohup nice -n 19 bash run_r5_tpu.sh > /tmp/r5_tpu.log 2>&1 &
set -u
cd /root/repo
mkdir -p log/perf_r5

probe_tunnel() {
  # bounded (ADVICE r3): ~1h of dead tunnel -> emit a marker and give up
  for _ in $(seq 1 20); do
    if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then return 0; fi
    sleep 180
  done
  echo "R5_TPU_STALLED $(date +%H:%M:%S)"
  return 1
}

step() {
  name="$1"; to="$2"; shift 2
  probe_tunnel || return 1
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout "$to" "$@" > "log/perf_r5/${name}.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

step bench_foodcom_rp128 5400 python -u bench.py
step zoo_foodcom_rp128   5400 python -u tools/epoch_times.py --out bench_zoo_foodcom.json
step zoo_allrec_rp128    7200 env FOODREC_BENCH_SCALE=allrecipes python -u tools/epoch_times.py --out bench_zoo_allrecipes.json
step bench_allrec_rp128  7200 env FOODREC_BENCH_SCALE=allrecipes python -u bench.py
step schgn1001_foodcom   5400 python -u parity_check.py --side ours --model SCHGN --epochs 15 --scale foodcom --seeds 1001
step schgn1002_foodcom   5400 python -u parity_check.py --side ours --model SCHGN --epochs 15 --scale foodcom --seeds 1002
step bm31000_allrec      5400 python -u parity_check.py --side ours --model BM3 --epochs 15 --scale allrecipes --seeds 1000
echo R5_TPU_ALL_DONE

#!/bin/bash
# Round-4g: revalidate after the SpMM ROW_PANEL 256->128 geometry change
# (sweep-backed at both operating points, tools/spmm_microbench.py).
# Chained behind the r4f perf queue (one TPU process at a time):
#   1. bench.py at Foodcom scale — re-warms the compile cache with the new
#      geometry AND re-runs both correctness gates (pallas-vs-segment
#      allclose on the real kernels, planted-signal accuracy floor).
#   2. Whole-zoo epoch-time sweep at both scales with the new geometry
#      (updates bench_zoo_{foodcom,allrecipes}.json).
#   3. bench.py at Allrecipes scale (headline epoch + gates there).
#   4. Two more SCHGN at-scale parity seeds (1001/1002) to pin the fix-15
#      bimodality rate (seed 999 stalls at AUC 0.63, 998/1000 reach 0.92).
# Usage: nohup nice -n 19 bash run_r4g_revalidate.sh > /tmp/r4g.log 2>&1 &
#        echo $! > /tmp/r4g.pid
set -u
cd /root/repo
mkdir -p log/perf_r4

echo "waiting for r4f queue to drain... $(date +%H:%M:%S)"
while ! grep -q R4F_PERF_ALL_DONE /tmp/r4f_perf.log 2>/dev/null; do sleep 60; done
echo "r4f done $(date +%H:%M:%S)"

probe_tunnel() {
  while true; do
    if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then break; fi
    sleep 180
  done
}

step() {
  name="$1"; to="$2"; shift 2
  probe_tunnel
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout "$to" nice -n 19 "$@" > "log/perf_r4/${name}.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

step bench_foodcom_rp128 3600 python -u bench.py
step zoo_foodcom_rp128 5400 python -u tools/epoch_times.py
step zoo_allrec_rp128 7200 env FOODREC_BENCH_SCALE=allrecipes python -u tools/epoch_times.py
step bench_allrec_rp128 7200 env FOODREC_BENCH_SCALE=allrecipes python -u bench.py
step schgn1001_foodcom 3600 python -u parity_check.py --side ours --model SCHGN --epochs 15 --scale foodcom --seeds 1001
step schgn1002_foodcom 3600 python -u parity_check.py --side ours --model SCHGN --epochs 15 --scale foodcom --seeds 1002
echo R4G_ALL_DONE

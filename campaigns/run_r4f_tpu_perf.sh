#!/bin/bash
# Round-4f TPU perf-evidence queue (waits for the r4d ours queue so only
# one TPU process runs at a time):
#   1. SpMM geometry sweep at the Allrecipes operating point (ui graph:
#      68,768x45,630, 676,946 edges; ri graph: 45,630x19,987, 395,086
#      edges) — the shipped (EDGE_BLOCK, ROW_PANEL) was swept only at
#      Foodcom's 190k edges; 3.5x the edges may move the optimum.
#   2. Allrecipes-scale CIKM epoch trace + HLO self-time breakdown — the
#      Foodcom floor analysis (PARITY.md) has no Allrecipes counterpart.
# Usage: nohup nice -n 19 bash run_r4f_tpu_perf.sh > /tmp/r4f_perf.log 2>&1 &
#        echo $! > /tmp/r4f_perf.pid
set -u
cd /root/repo
mkdir -p log/perf_r4

echo "waiting for r4d queue to drain... $(date +%H:%M:%S)"
while ! grep -q R4D_OURS_ALL_DONE /tmp/r4d_ours.log 2>/dev/null; do sleep 60; done
echo "r4d done $(date +%H:%M:%S)"

probe_tunnel() {
  while true; do
    if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then break; fi
    sleep 180
  done
}

probe_tunnel
echo "=== spmm sweep, Allrecipes ui geometry === $(date +%H:%M:%S)"
timeout 3600 nice -n 19 python -u tools/spmm_microbench.py \
  --users 68768 --items 45630 --edges 676946 \
  > log/perf_r4/spmm_allrec_ui.log 2>&1
echo "rc=$? ui sweep done $(date +%H:%M:%S)"

probe_tunnel
echo "=== spmm sweep, Allrecipes ri geometry === $(date +%H:%M:%S)"
timeout 3600 nice -n 19 python -u tools/spmm_microbench.py \
  --users 45630 --items 19987 --edges 395086 \
  > log/perf_r4/spmm_allrec_ri.log 2>&1
echo "rc=$? ri sweep done $(date +%H:%M:%S)"

probe_tunnel
echo "=== Allrecipes CIKM epoch trace === $(date +%H:%M:%S)"
FOODREC_BENCH_SCALE=allrecipes timeout 3600 nice -n 19 python -u \
  tools/profile_epoch.py --trace_dir /tmp/foodrec_trace_allrec \
  > log/perf_r4/profile_allrec.log 2>&1
echo "rc=$? trace done $(date +%H:%M:%S)"
echo R4F_PERF_ALL_DONE

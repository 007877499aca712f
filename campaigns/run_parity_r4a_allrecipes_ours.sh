#!/bin/bash
# Round-4a ours side: TPU runs for the Allrecipes-scale parity points
# (LightGCN, BM3 — fixed-15, seed 999), then free cache-hit aggregate
# passes once the torch ref side (run_parity_r4a_allrecipes_ref.sh) has
# written its caches. Ours runs are minutes on one chip; the aggregate
# waits poll the ref caches.
# Usage: nohup bash run_parity_r4a_allrecipes_ours.sh > /tmp/r4a_ours.log 2>&1 &
#        echo $! > /tmp/r4a_ours.pid
set -u
cd /root/repo
mkdir -p log/parity_r4
RES=/tmp/foodrec_parity/results

echo "probing tunnel... $(date +%H:%M:%S)"
while true; do
  if timeout 60 python -c "import jax; jax.devices()" 2>/dev/null; then break; fi
  sleep 120
done
echo "tunnel up $(date +%H:%M:%S)"

run_ours() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10800 python -u parity_check.py --side ours "$@" \
    > "log/parity_r4/${name}_ours.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}
run_agg() {
  name="$1"; ref_cache="$2"; shift 2
  while [ ! -f "$RES/$ref_cache" ]; do sleep 300; done
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout 3600 python -u parity_check.py --side ref "$@" \
    > "log/parity_r4/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run_ours allrec999_LightGCN --model LightGCN --epochs 15 --scale allrecipes --seeds 999
run_ours allrec999_BM3      --model BM3      --epochs 15 --scale allrecipes --seeds 999

run_agg agg4a_LightGCN ref_LightGCN_999_fix15_allrecipes.json --model LightGCN --epochs 15 --scale allrecipes --seeds 999
run_agg agg4a_BM3      ref_BM3_999_fix15_allrecipes.json      --model BM3      --epochs 15 --scale allrecipes --seeds 999
echo R4A_OURS_ALL_DONE

#!/bin/bash
# Rerun the r3c CIKM ref step: the original hung ~3h on a futex with zero
# CPU progress (all 8 threads asleep at the start of seed 1001's training;
# killed after confirming 0.02s CPU over 30s). Waits for the main r3c ref
# campaign shell to exit so only one torch job runs on the single core.
# OMP_NUM_THREADS=1 removes the torch intra-op thread-pool wakeup path the
# hang was sleeping in (1-core box: no parallelism lost).
set -u
cd /root/repo
RES=/tmp/foodrec_parity/results

while kill -0 "$(cat /tmp/r3c_ref.pid)" 2>/dev/null; do sleep 30; done

echo "=== retry es3c_CIKM === $(date +%H:%M:%S)"
JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 timeout 18000 \
  python -u parity_check.py --side ref --model CIKM_Model \
  --epochs 100 --early_stop --seeds 998,999,1000,1001,1002 \
  > log/parity_r3/es3c_CIKM_retry_ref.log 2>&1
echo "rc=$? done $(date +%H:%M:%S)"
echo CIKM_RETRY_DONE

#!/bin/bash
# Round-4e torch-ref queue: after the r4b ref queue drains (LightGCN
# Allrecipes + CIKM Foodcom at scale), spend any remaining host-CPU
# budget widening the Foodcom-scale ref seed sets for the two models
# whose at-scale delta needs tighter error bars:
#   1. LightGCN seed 1000 (74 min) — current ref n=2 vs ours n=5,
#      delta of means -0.98%: a third ref seed tells us whether the ref
#      mean is really above ours' scatter or the n=2 draw was high.
#   2. BM3 seed 1000 (94 min) — symmetric widening, runs only if the
#      round still has budget (a cut partial run wastes nothing: the
#      result cache is written atomically at the end).
# Ours-side seeds 1000 already exist for both (r4c), so pairing is
# automatic in tools/make_parity_table.py.
# Usage: nohup bash run_parity_r4e_ref.sh > /tmp/r4e_ref.log 2>&1 &
#        echo $! > /tmp/r4e_ref.pid
set -u
cd /root/repo
mkdir -p log/parity_r4

echo "waiting for r4b ref queue to drain... $(date +%H:%M:%S)"
while ! grep -q R4B_REF_ALL_DONE /tmp/r4b_ref.log 2>/dev/null; do sleep 120; done
echo "r4b ref done $(date +%H:%M:%S)"

run() {
  name="$1"; to="$2"; shift 2
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout "$to" python -u parity_check.py --side ref "$@" \
    > "log/parity_r4/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run lgcn1000_foodcom 10800 --model LightGCN --epochs 15 --scale foodcom --seeds 1000
run bm31000_foodcom  10800 --model BM3      --epochs 15 --scale foodcom --seeds 1000
echo R4E_REF_ALL_DONE

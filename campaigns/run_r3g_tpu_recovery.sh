#!/bin/bash
# Combined TPU-recovery chain (supersedes run_r3e_tpu_recovery.sh): the
# torch ref side for BOTH pending campaigns already ran ref-first during
# the tunnel outage (run_parity_r3f_ref_first.sh, ALL_REF_FIRST_DONE
# 11:44), so everything left is ours-side + free cache-hit aggregates.
# Order: cheap parity runs first, the ~2h Foodcom-XL optimizer A/B last.
#   1. Foodcom-scale fixed-15 seed 998 (LightGCN, BM3)   — r3e ours
#   2. FGCN/BM3 early-stop seeds 1003-1007               — r3f ours
#   3. free aggregate passes (all seeds cached, both sides)
#   4. tools/xl_rowsparse_ab.py (dense-vs-row-sparse Adam at 675M params)
# One TPU job at a time throughout.
set -u
cd /root/repo
mkdir -p log/parity_r3
S_NEW=1003,1004,1005,1006,1007
S_ALL=998,999,1000,1001,1002,$S_NEW

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
# aggregates: every per-seed result is cached on both sides, so these
# only read caches and print per-seed + mean/std delta tables.
run_agg() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout 3600 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run_ours scale998_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 998
run_ours scale998_BM3      --model BM3      --epochs 15 --scale foodcom --seeds 998
run_ours es3f_FGCN --model FGCN --epochs 100 --early_stop --seeds $S_NEW
run_ours es3f_BM3  --model BM3  --epochs 100 --early_stop --seeds $S_NEW

run_agg agg3g_FGCN_10seed --model FGCN --epochs 100 --early_stop --seeds $S_ALL
run_agg agg3g_BM3_10seed  --model BM3  --epochs 100 --early_stop --seeds $S_ALL
run_agg agg3g_scale_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 998,999
run_agg agg3g_scale_BM3      --model BM3      --epochs 15 --scale foodcom --seeds 998,999

echo "=== xl_rowsparse_ab === $(date +%H:%M:%S)"
timeout 7200 python -u tools/xl_rowsparse_ab.py > /tmp/xl_ab.log 2>&1
echo "rc=$? xl_ab done $(date +%H:%M:%S)"
echo R3G_ALL_DONE

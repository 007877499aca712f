#!/bin/bash
# Round-3d ref campaign: finish the r3c ref-side work after the axon TPU
# tunnel outage. The tunnel dying mid-campaign hung every python process
# at `import jax` (sitecustomize's axon register() blocks with no timeout,
# even under JAX_PLATFORMS=cpu) — the CIKM step sat 3h at zero CPU and BM3
# hung at import. Fix: unset PALLAS_AXON_POOL_IPS so sitecustomize skips
# axon registration entirely; the ref side is pure CPU (torch + jax-CPU
# eval kernels) and never needed the tunnel. Ours-side caches are already
# fully populated, so every step here is torch + free cached aggregates.
# Runs shortest-first so partial results land early.
set -u
cd /root/repo
mkdir -p log/parity_r3

run() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout 18000 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

# MG aggregate: all 3 ref seeds cached -> free
run mg3d_LightGCN --model LightGCN --epochs 30 --mg --seeds 998,999,1000
# PRICAI: one live seed (1002)
run es3d_PRICAI --model PRICAI_ModelX --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002
# BM3: two live seeds (1001, 1002)
run es3d_BM3 --model BM3 --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002
# CIKM: two live seeds (1001, 1002) — the longest (~40 min/seed)
run es3d_CIKM --model CIKM_Model --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002
echo ALL_REF_DONE

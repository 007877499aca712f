#!/bin/bash
# Round-3e: second seed (998) for the Foodcom-scale parity points
# (VERDICT r2 item 2 follow-through: LightGCN/BM3 fixed-15 at the
# reference's real operating point had one seed each "by design" — the
# idle box affords a second). REF SIDE ONLY here: the torch runs are
# 74-94 min each and don't need the TPU; the ours side costs seconds
# per run once the axon tunnel is back (run_parity_r3e_ours.sh).
# Uses the axon-bypass env: the tunnel outage hangs any python that
# doesn't skip axon registration (see run_parity_r3d_ref.sh).
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

run scale998_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 998
run scale998_BM3      --model BM3      --epochs 15 --scale foodcom --seeds 998
echo ALL_REF_DONE

#!/bin/bash
# Round-3h ours side: TPU runs for the four new Foodcom-scale parity points
# (CIKM_Model, SCHGN, FGCN, PRICAI_ModelX — seed 999 fixed-15), then free
# cache-hit aggregate passes for the full six-model scale table.
# Serialization: ONE TPU job at a time on this box — waits for the tunnel
# AND for run_r3g_tpu_recovery.sh (R3G_ALL_DONE in /tmp/r3g.log, or its
# pid gone) before touching the TPU. The torch ref side runs independently
# (run_parity_r3h_scale_ref.sh); per-model aggregates additionally wait
# for that model's ref cache file.
set -u
cd /root/repo
mkdir -p log/parity_r3
RES=/tmp/foodrec_parity/results

while true; do
  if timeout 60 python -c "import jax; jax.devices()" 2>/dev/null; then break; fi
  sleep 120
done
echo "tunnel up $(date +%H:%M:%S)"
while kill -0 "$(cat /tmp/r3g.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q R3G_ALL_DONE /tmp/r3g.log 2>/dev/null; do sleep 120; done
echo "r3g done $(date +%H:%M:%S)"

run_ours() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10800 python -u parity_check.py --side ours "$@" \
    > "log/parity_r3/${name}_ours.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}
run_agg() {
  name="$1"; ref_cache="$2"; shift 2
  while [ ! -f "$RES/$ref_cache" ]; do sleep 120; done
  echo "=== $name: $* === $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
    timeout 3600 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

run_ours scale999_CIKM   --model CIKM_Model    --epochs 15 --scale foodcom --seeds 999
run_ours scale999_SCHGN  --model SCHGN         --epochs 15 --scale foodcom --seeds 999
run_ours scale999_FGCN   --model FGCN          --epochs 15 --scale foodcom --seeds 999
run_ours scale999_PRICAI --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 999

run_agg agg3h_scale_CIKM   ref_CIKM_Model_999_fix15_foodcom.json    --model CIKM_Model    --epochs 15 --scale foodcom --seeds 999
run_agg agg3h_scale_SCHGN  ref_SCHGN_999_fix15_foodcom.json         --model SCHGN         --epochs 15 --scale foodcom --seeds 999
run_agg agg3h_scale_FGCN   ref_FGCN_999_fix15_foodcom.json          --model FGCN          --epochs 15 --scale foodcom --seeds 999
run_agg agg3h_scale_PRICAI ref_PRICAI_ModelX_999_fix15_foodcom.json --model PRICAI_ModelX --epochs 15 --scale foodcom --seeds 999
echo R3H_OURS_ALL_DONE

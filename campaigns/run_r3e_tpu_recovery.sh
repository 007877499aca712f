#!/bin/bash
# TPU-recovery chain for round-3e: poll the axon tunnel (timeout-guarded
# probe — a down tunnel hangs jax.devices() forever); once it's back:
#   1. ours-side Foodcom-scale seed-998 runs (seconds each on the chip)
#   2. kick the torch ref side (run_parity_r3e_ref.sh, ~3h CPU)
#   3. the Foodcom-XL dense-vs-row-sparse Adam A/B (tools/xl_rowsparse_ab.py)
# One TPU job at a time throughout.
set -u
cd /root/repo
mkdir -p log/parity_r3

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

run_ours scale998_LightGCN --model LightGCN --epochs 15 --scale foodcom --seeds 998
run_ours scale998_BM3      --model BM3      --epochs 15 --scale foodcom --seeds 998

# torch side in the background (CPU-only, axon-bypassed)
nohup bash run_parity_r3e_ref.sh > /tmp/r3e_ref.log 2>&1 &
echo $! > /tmp/r3e_ref.pid
echo "ref side launched pid $(cat /tmp/r3e_ref.pid)"

echo "=== xl_rowsparse_ab === $(date +%H:%M:%S)"
timeout 7200 python -u tools/xl_rowsparse_ab.py > /tmp/xl_ab.log 2>&1
echo "rc=$? xl_ab done $(date +%H:%M:%S)"
echo RECOVERY_DONE

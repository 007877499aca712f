#!/bin/bash
# Round-4 TPU job spool (single v5-lite chip; jobs niced so the serial
# torch-ref chain keeps the one host core). Same contract as
# run_r4_ref_spool.sh: log/tpu_spool/NNN_name.job in lexicographic order,
# .done only on rc=0, STOP sentinel + empty spool exits. Per ADVICE r3 the
# tunnel probe is BOUNDED: after ~1h of dead tunnel the queue emits
# R4_TPU_STALLED and keeps cycling (so a recovered tunnel resumes work).
# Usage: nohup nice -n 19 bash run_r4_tpu_spool.sh > /tmp/r4_tpu_spool.log 2>&1 &
set -u
cd /root/repo
SPOOL=log/tpu_spool
mkdir -p "$SPOOL" log/perf_r4

probe_tunnel() {
  for _ in $(seq 1 20); do
    if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
      return 0
    fi
    sleep 180
  done
  echo "R4_TPU_STALLED $(date +%H:%M:%S)"
  return 1
}

while true; do
  job=$(ls "$SPOOL"/*.job 2>/dev/null | head -1)
  if [ -z "$job" ]; then
    if [ -f "$SPOOL/STOP" ]; then echo "R4_TPU_QUEUE_DRAINED"; break; fi
    sleep 30
    continue
  fi
  if ! probe_tunnel; then continue; fi
  name=$(basename "$job" .job)
  echo "=== $name start $(date +%H:%M:%S) ==="
  bash "$job" > "log/perf_r4/${name}.log" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "OK $name $(date +%H:%M:%S)"
    mv "$job" "$SPOOL/${name}.done"
  else
    echo "FAIL rc=$rc $name $(date +%H:%M:%S)"
    mv "$job" "$SPOOL/${name}.fail"
  fi
done

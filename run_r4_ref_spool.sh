#!/bin/bash
# Round-4 serial torch-ref job spool (this box has ONE CPU core, so ref-side
# work is strictly serial; ~10h of torch capacity per round). Processes
# log/ref_spool/NNN_name.job in lexicographic order so priorities can be
# re-ordered / inserted while the queue runs. Each .job is a bash script run
# with its own timeout inside. Per ADVICE r3: success markers (.done) are
# emitted only on rc=0; failures become .fail and the queue moves on; the
# queue exits when a STOP sentinel exists and the spool is drained.
# Usage: nohup bash run_r4_ref_spool.sh > /tmp/r4_ref_spool.log 2>&1 &
set -u
cd /root/repo
SPOOL=log/ref_spool
mkdir -p "$SPOOL" log/parity_r4
while true; do
  job=$(ls "$SPOOL"/*.job 2>/dev/null | head -1)
  if [ -z "$job" ]; then
    if [ -f "$SPOOL/STOP" ]; then echo "R4_REF_QUEUE_DRAINED"; break; fi
    sleep 30
    continue
  fi
  name=$(basename "$job" .job)
  echo "=== $name start $(date +%H:%M:%S) ==="
  bash "$job" > "log/parity_r4/${name}.log" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "OK $name $(date +%H:%M:%S)"
    mv "$job" "$SPOOL/${name}.done"
  else
    echo "FAIL rc=$rc $name $(date +%H:%M:%S)"
    mv "$job" "$SPOOL/${name}.fail"
  fi
done

#!/bin/bash
# Round-3 follow-up, REFERENCE side: FGCN 5-seed widening + mess_dropout=0
# attribution ablation. The box has ONE core, so this waits for the main
# ref campaign (run_parity_r3_ref.sh -> ALL_REF_DONE) and for the
# ours-side cache files before each run.
set -u
cd /root/repo
mkdir -p log/parity_r3
RES=/tmp/foodrec_parity/results

while ! grep -q ALL_REF_DONE /tmp/campaign_ref.log 2>/dev/null; do
  sleep 60
done

wait_for() {
  for f in "$@"; do
    n=0
    while [ ! -f "$RES/$f" ]; do
      sleep 30
      n=$((n + 30))
      if [ $n -ge 21600 ]; then echo "TIMEOUT waiting for $f"; return 1; fi
    done
  done
}

run() {
  name="$1"; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  JAX_PLATFORMS=cpu timeout 18000 python -u parity_check.py --side ref "$@" \
    > "log/parity_r3/${name}_ref.log" 2>&1
  echo "rc=$? $name done $(date +%H:%M:%S)"
}

wait_for FGCN_1001_es.json FGCN_1002_es.json
# full 5-seed aggregate (998-1000 ref runs are cached)
run es_FGCN_agg --model FGCN --epochs 100 --early_stop \
    --seeds 998,999,1000,1001,1002

ND=es_mess_dropout=0.0
wait_for "FGCN_998_${ND}.json" "FGCN_1000_${ND}.json"
run es_FGCN_nodrop --model FGCN --epochs 100 --early_stop \
    --seeds 998,999,1000 --set mess_dropout=0.0
echo ALL_REF_B_DONE

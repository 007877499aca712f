#!/bin/bash
# Artifact auto-committer: while the r4 job spools drain (multi-hour torch
# anchors + TPU lockstep recordings), commit each newly landed result JSON so
# evidence reaches git even if no interactive session is alive when a job
# finishes. Scope is intentionally narrow: parity_results/ and the bench
# artifact JSONs at the repo root. Runs until a STOP sentinel appears AND
# both spools are drained, then exits.
# Usage: nohup bash tools/autocommit_artifacts.sh > /tmp/autocommit.log 2>&1 &
set -u
cd /root/repo
while true; do
  # Stage only result artifacts; never source code (sessions own that).
  git add -A parity_results bench_zoo_foodcom.json bench_zoo_allrecipes.json \
    bench_allrecipes.json bench_baseline.json bench_compile.json 2>/dev/null
  if ! git diff --cached --quiet; then
    n=$(git diff --cached --name-only | wc -l)
    names=$(git diff --cached --name-only | sed 's|.*/||' | head -4 | paste -sd', ' -)
    # pathspec-limited commit: never sweeps up unrelated staged work from a
    # concurrent interactive session
    git commit -q -m "Artifact batch: ${n} result file(s) from the r4 spools (${names}...)" \
      -- parity_results bench_zoo_foodcom.json bench_zoo_allrecipes.json \
         bench_allrecipes.json bench_baseline.json bench_compile.json \
      && echo "committed ${n} at $(date +%H:%M:%S)"
  fi
  # Exit once both spools report drained and nothing new is pending.
  if grep -q R4_REF_QUEUE_DRAINED /tmp/r4_ref_spool.log 2>/dev/null \
     && grep -q R4_TPU_QUEUE_DRAINED /tmp/r4_tpu_spool.log 2>/dev/null; then
    git add -A parity_results 2>/dev/null
    git diff --cached --quiet || git commit -q -m "Artifact batch: final spool drain" -- parity_results
    echo "spools drained; exiting $(date +%H:%M:%S)"
    break
  fi
  sleep 900
done

#!/bin/bash
# Artifact auto-committer: while the job spools drain (multi-hour torch
# anchors + TPU lockstep recordings), commit each newly landed result JSON so
# evidence reaches git even if no interactive session is alive when a job
# finishes. Scope is intentionally narrow: parity_results/ and the bench
# artifact JSONs at the repo root. Runs until a STOP sentinel appears AND
# both spools are drained, then exits.
#
# ADVICE r4 fixes: (1) pathspecs are added individually so one missing file
# no longer aborts the whole `git add` batch, and add failures are logged
# instead of discarded; (2) files modified in the last 30s are skipped so a
# JSON still being written by a running job is never committed truncated.
# Usage: nohup bash tools/autocommit_artifacts.sh > /tmp/autocommit.log 2>&1 &
set -u
cd /root/repo
ARTIFACTS=(bench_zoo_foodcom.json bench_zoo_allrecipes.json
           bench_allrecipes.json bench_baseline.json bench_compile.json)

stage_quiesced() {
  # Stage only result artifacts; never source code (sessions own that).
  # Skip anything with mtime within the last 30s (may be mid-write).
  local now cutoff f
  now=$(date +%s)
  cutoff=$((now - 30))
  for f in parity_results/*.json "${ARTIFACTS[@]}"; do
    [ -f "$f" ] || continue
    local mt
    mt=$(stat -c %Y "$f" 2>/dev/null) || continue
    [ "$mt" -le "$cutoff" ] || continue
    git add -- "$f" || echo "add failed: $f at $(date +%H:%M:%S)" >&2
  done
}

while true; do
  stage_quiesced
  if ! git diff --cached --quiet; then
    n=$(git diff --cached --name-only | wc -l)
    names=$(git diff --cached --name-only | sed 's|.*/||' | head -4 | paste -sd', ' -)
    # pathspec-limited commit: never sweeps up unrelated staged work from a
    # concurrent interactive session
    git commit -q -m "Artifact batch: ${n} result file(s) from the job spools (${names}...)" \
      -- parity_results "${ARTIFACTS[@]}" \
      && echo "committed ${n} at $(date +%H:%M:%S)"
  fi
  # Exit once both spools report drained and nothing new is pending.
  if grep -q R4_REF_QUEUE_DRAINED /tmp/r4_ref_spool.log 2>/dev/null \
     && grep -q R4_TPU_QUEUE_DRAINED /tmp/r4_tpu_spool.log 2>/dev/null; then
    stage_quiesced
    git diff --cached --quiet || git commit -q -m "Artifact batch: final spool drain" -- parity_results "${ARTIFACTS[@]}"
    echo "spools drained; exiting $(date +%H:%M:%S)"
    break
  fi
  sleep 900
done

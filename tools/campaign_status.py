#!/usr/bin/env python
"""One-screen status of the parity/perf campaign spools.

Shows, per spool (log/ref_spool, log/tpu_spool): queued / running / done /
failed jobs with the tail of the running job's log, plus the newest
parity_results artifacts. Read-only; safe to run while the queues churn.
"""
import glob
import json
import os
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _log_for(spool: str, name: str) -> str:
    logdir = {"ref_spool": "parity_r4", "tpu_spool": "perf_r4"}[spool]
    return os.path.join(REPO, "log", logdir, name + ".log")


def spool_status(spool: str) -> None:
    root = os.path.join(REPO, "log", spool)
    if not os.path.isdir(root):
        print(f"[{spool}] (missing)")
        return
    entries = sorted(os.listdir(root))
    jobs = [e for e in entries if e.endswith(".job")]
    done = [e for e in entries if e.endswith(".done")]
    fail = [e for e in entries if e.endswith(".fail")]
    print(f"[{spool}] queued={len(jobs)} done={len(done)} failed={len(fail)}"
          f"{'  STOP' if 'STOP' in entries else ''}")
    for e in fail:
        print(f"  FAIL {e}")
    for i, e in enumerate(jobs):
        name = e[: -len(".job")]
        log = _log_for(spool, name)
        running = os.path.isfile(log) and i == 0
        mark = "RUNNING" if running else "queued "
        print(f"  {mark} {name}")
        if running:
            try:
                tail = subprocess.run(
                    ["tail", "-2", log], capture_output=True, text=True
                ).stdout.strip()
                for line in tail.splitlines():
                    print(f"      | {line[:150]}")
            except OSError:
                pass


def newest_artifacts(n: int = 8) -> None:
    res = sorted(
        glob.glob(os.path.join(REPO, "parity_results", "*.json")),
        key=os.path.getmtime,
    )[-n:]
    print(f"[parity_results] newest {n}:")
    now = time.time()
    for p in res:
        age_min = (now - os.path.getmtime(p)) / 60
        base = os.path.basename(p)
        extra = ""
        try:
            with open(p) as f:
                d = json.load(f)
            if isinstance(d, dict) and isinstance(d.get("NDCG@20"), float):
                extra = f"  NDCG@20={d['NDCG@20']:.4f}"
        except (OSError, ValueError):
            pass
        print(f"  {age_min:7.1f}m  {base}{extra}")


if __name__ == "__main__":
    spool_status("ref_spool")
    spool_status("tpu_spool")
    newest_artifacts()

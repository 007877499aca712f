"""The emitted parity tables must never contain a literal `nan` cell
(VERDICT r4 weak #4): ref-less at-scale rows render an explicit reason
(REF_PENDING tag or "no ref endpoint"), and n=1 groups render "(n=1)"
instead of a nan std."""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    out = subprocess.run([sys.executable, os.path.join(REPO, "tools",
                                                       "make_parity_table.py")]
                         + args, cwd=cwd, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    return out.stdout


def _write(d, name, metrics):
    with open(os.path.join(d, name), "w") as fh:
        json.dump(metrics, fh)


def test_scale_table_has_no_nan(tmp_path):
    d = str(tmp_path)
    m = {"NDCG@20": 0.2, "Recall@20": 0.3}
    # ours-only row (no ref endpoint), single seed -> both nan paths at once
    _write(d, "LightGCN_998_fix15_foodcom.json", m)
    # paired row with one shared seed -> paired std is undefined (n=1)
    _write(d, "BM3_998_fix15_foodcom.json", {"NDCG@20": 0.21})
    _write(d, "ref_BM3_998_fix15_foodcom.json", {"NDCG@20": 0.20})
    out = _run(["--scale-stats", "--dir", d], cwd=REPO)
    assert "nan" not in out
    assert "(n=1)" in out
    # the ref-less LightGCN foodcom row carries its REF_PENDING reason
    assert "no ref endpoint" in out or "anchors only" in out or "queued" in out


def test_scale_table_refless_row_uses_pending_note(tmp_path):
    d = str(tmp_path)
    _write(d, "PRICAI_ModelX_998_fix15_foodcom.json", {"NDCG@20": 0.16})
    _write(d, "PRICAI_ModelX_999_fix15_foodcom.json", {"NDCG@20": 0.16})
    out = _run(["--scale-stats", "--dir", d], cwd=REPO)
    assert "nan" not in out
    assert "anchors only" in out


def test_per_protocol_table_has_no_nan(tmp_path):
    d = str(tmp_path)
    _write(d, "LightGCN_998_fix15.json", {"NDCG@20": 0.2})
    _write(d, "ref_LightGCN_998_fix15.json", {"NDCG@20": 0.2})
    out = _run(["--dir", d], cwd=REPO)
    assert "nan" not in out
    assert "(n=1)" in out


def test_committed_results_render_without_nan():
    """The real repo artifacts must render nan-free end to end."""
    out = _run(["--scale-stats", "--dir",
                os.path.join(REPO, "parity_results")], cwd=REPO)
    assert "nan" not in out
    out = _run(["--dir", os.path.join(REPO, "parity_results")], cwd=REPO)
    assert "nan" not in out

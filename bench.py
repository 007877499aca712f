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

BENCH_ROOT = os.environ.get("FOODREC_BENCH_ROOT", "/tmp/foodrec_bench")
DATASET = "FoodcomSynth"

FOODCOM_SCALE = dict(
    n_users=7596, n_items=29943, n_ingredients=4963, n_cal_levels=60,
    n_health_levels=6, n_clusters=2000, img_dim=2048, txt_dim=512,
    neg_num=500, train_per_user=(20, 31), valid_per_user=(2, 7),
    test_per_user=(8, 17), seed=7,
)

N_TIMED_EPOCHS = 3


def ensure_dataset():
    from foodrec_tpu.data import synthetic

    root = os.path.join(BENCH_ROOT, DATASET)
    marker = os.path.join(root, "processed_dataset", "data.train.rating")
    if not os.path.isfile(marker):
        t0 = time.time()
        synthetic.generate(root, **FOODCOM_SCALE)
        print(f"# generated {DATASET} in {time.time() - t0:.1f}s", file=sys.stderr)
    return BENCH_ROOT + "/"


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

    import jax

    params = model.init_params(jax.random.PRNGKey(999))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(0)

    # compile warmup
    t0 = time.time()
    key, k = jax.random.split(key)
    params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
    jax.block_until_ready(parts)
    print(f"# warmup epoch (compile): {time.time() - t0:.1f}s", flush=True, file=sys.stderr)

    times = []
    for _ in range(N_TIMED_EPOCHS):
        key, k = jax.random.split(key)
        t0 = time.time()
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
        jax.block_until_ready(parts)
        times.append(time.time() - t0)
        print(f"# epoch: {times[-1]:.2f}s", flush=True, file=sys.stderr)
    times.sort()
    epoch_s = times[len(times) // 2]

    # eval throughput (extra context, not the headline metric)
    t0 = time.time()
    trainer._valid(params, data.device_data.eval_valid)  # compile on valid
    print(f"# eval compile+valid: {time.time() - t0:.1f}s", flush=True, file=sys.stderr)
    t0 = time.time()
    _, metrics = trainer._valid(params, data.device_data.eval_test)
    eval_users_per_s = data.device_data.eval_test.n_users / (time.time() - t0)
    print(f"# eval test: {time.time() - t0:.1f}s", flush=True, file=sys.stderr)

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("cikm_cpu_epoch_s")
        if ref:
            vs_baseline = ref / epoch_s

    print(json.dumps({
        "metric": "cikm_foodcom_epoch_time",
        "value": round(epoch_s, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extra": {
            "n_train": int(data.device_data.n_train),
            "train_inters_per_s": round(data.device_data.n_train / epoch_s),
            "eval_users_per_s": round(eval_users_per_s, 1),
            "ndcg20_smoke": metrics["NDCG@20"],
            "device": jax.devices()[0].platform,
            "epoch_times_s": [round(t, 3) for t in times],
        },
    }))


if __name__ == "__main__":
    main()

"""Ours-side training-epoch wall-clock for EVERY model at a bench scale.

bench.py's headline is the flagship (CIKM_Model); this sweeps the whole
zoo on the same synthetic dataset so the at-scale throughput story covers
all six models (BASELINE.json names SCHGN/CLUSSL/HealthRec configs on
Allrecipes). Runs on the default jax device (TPU under axon).

Usage:
    FOODREC_BENCH_SCALE=allrecipes python tools/epoch_times.py \
        [--models LightGCN,BM3,...] [--epochs 3]
Prints one JSON line per model and a final summary JSON.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_MODELS = ["LightGCN", "BM3", "FGCN", "SCHGN", "PRICAI_ModelX",
              "CIKM_Model"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(ALL_MODELS))
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=None,
                    help="optional path for the summary JSON")
    ap.add_argument("--root", default=None,
                    help="existing dataset root (e.g. /tmp/foodrec_parity/) "
                         "to reuse instead of generating the bench synthetic")
    ap.add_argument("--dataset", default=None,
                    help="dataset dir name under --root "
                         "(e.g. AllrecipesStruct)")
    args = ap.parse_args()

    import bench  # reuses FOODREC_BENCH_SCALE / dataset generation

    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    if args.root:
        data_path, ds_name = args.root, args.dataset or bench.DATASET
    else:
        data_path, ds_name = bench.ensure_dataset(), bench.DATASET

    import jax

    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    summary = {"scale": ds_name, "device": jax.default_backend(),
               "epochs_timed": args.epochs, "models": {}}
    for name in args.models.split(","):
        name = name.strip()
        t0 = time.time()
        cfg = Config(model=name, dataset=ds_name,
                     config_dict={"data_path": data_path,
                                  "neg_sample_num": 500, "seed": 999})
        derive_data_paths(cfg, ds_name)
        data = FoodData(cfg)
        data.device_data = DeviceData.from_food_data(data, cfg)
        load_s = time.time() - t0
        t0 = time.time()
        model = get_model(name)(cfg, data)
        trainer = Trainer(cfg, model)
        params = model.init_params(jax.random.PRNGKey(999))
        opt_state = trainer.optimizer.init(params)
        build_s = time.time() - t0

        key = jax.random.PRNGKey(0)
        t0 = time.time()
        key, k = jax.random.split(key)
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
        jax.block_until_ready(parts)
        warmup_s = time.time() - t0
        times = []
        for _ in range(args.epochs):
            key, k = jax.random.split(key)
            t0 = time.time()
            params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
            jax.block_until_ready(parts)
            times.append(time.time() - t0)
        parts_np = np.asarray(parts)
        assert np.all(np.isfinite(parts_np)), (
            f"{name}: non-finite epoch loss parts {parts_np}")
        times.sort()
        row = {"epoch_s": round(times[len(times) // 2], 3),
               "epoch_times_s": [round(t, 3) for t in times],
               "warmup_s": round(warmup_s, 1),
               "load_s": round(load_s, 1), "build_s": round(build_s, 1),
               "n_train": int(data.device_data.n_train)}
        summary["models"][name] = row
        print(json.dumps({"model": name, **row}), flush=True)
        # release device buffers before the next model
        del params, opt_state, parts, model, trainer, data

    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)


if __name__ == "__main__":
    main()

# coding: utf-8
"""End-to-end A/B of the row-sparse Adam fast path at Foodcom-XL scale.

The isolated size sweep (tools/sparse_adam_microbench.py) grounds the
`row_sparse_table_update: auto` heuristic (on at n_rows > 64 x batch
rows), but the heuristic's claimed XL win was extrapolated, never
measured end to end. This tool measures it: CIKM_Model training epochs on
the Foodcom-XL synthetic (10x catalog = 299,430 items; trainable
[299430, 2048] image + [299430, 512] text tables, the same 675M-param
configuration PARITY.md reports at 93.5s/epoch from round 2) with the
row-sparse path forced OFF vs AUTO (on for both modality tables at
bs=512: 299,430 > 64 * 1024).

Each mode runs in its own subprocess (clean HBM, no cross-mode buffer
residue). Both modes share the seed and epoch key sequence, so their
epoch loss parts must agree to float32 roundoff — the fast path is
bit-exact by construction (engine/sparse_adam.py, tests/test_sparse_adam.py);
this doubles as an at-scale exactness check.

Usage:
  python tools/xl_rowsparse_ab.py            # orchestrate both modes
  python tools/xl_rowsparse_ab.py --mode dense|sparse   # one mode (JSON out)
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ROOT = os.environ.get("FOODREC_BENCH_ROOT", "/tmp/foodrec_bench")
DATASET = "FoodcomXLSynth"
XL_SCALE = dict(
    n_users=7596, n_items=299430, n_ingredients=4963, n_cal_levels=60,
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
        synthetic.generate(root, **XL_SCALE)
        print(f"# generated {DATASET} in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    return BENCH_ROOT + "/"


def run_mode(mode):
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    data_path = ensure_dataset()

    import jax

    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    rs = {"dense": False, "sparse": None}[mode]  # None == auto
    cfg = Config(model="CIKM_Model", dataset=DATASET,
                 config_dict={"data_path": data_path, "neg_sample_num": 500,
                              "seed": 999, "row_sparse_table_update": rs})
    derive_data_paths(cfg, DATASET)
    t0 = time.time()
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    print(f"# [{mode}] load: {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)

    params = model.init_params(jax.random.PRNGKey(999))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    key, k = jax.random.split(key)
    params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
    jax.block_until_ready(parts)
    warmup_s = time.time() - t0
    print(f"# [{mode}] warmup epoch (compile): {warmup_s:.1f}s",
          file=sys.stderr, flush=True)

    times = []
    for _ in range(N_TIMED_EPOCHS):
        key, k = jax.random.split(key)
        t0 = time.time()
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
        jax.block_until_ready(parts)
        times.append(round(time.time() - t0, 2))
        print(f"# [{mode}] epoch: {times[-1]:.2f}s", file=sys.stderr,
              flush=True)

    import numpy as np

    parts_np = np.asarray(parts, dtype=np.float64)
    assert np.all(np.isfinite(parts_np)), parts_np
    print(json.dumps({
        "mode": mode,
        "epoch_times_s": times,
        "median_s": sorted(times)[len(times) // 2],
        "warmup_s": round(warmup_s, 1),
        "final_loss_parts": [float(x) for x in parts_np],
        "n_items": XL_SCALE["n_items"],
    }))


def orchestrate():
    ensure_dataset()
    results = {}
    for mode in ("dense", "sparse"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode],
            capture_output=True, text=True)
        sys.stderr.write(out.stderr)
        if out.returncode != 0:
            print(f"[{mode}] FAILED rc={out.returncode}\n{out.stdout}")
            sys.exit(1)
        results[mode] = json.loads(out.stdout.strip().splitlines()[-1])

    d, s = results["dense"], results["sparse"]
    import numpy as np

    dl = np.array(d["final_loss_parts"])
    sl = np.array(s["final_loss_parts"])
    rel = float(np.max(np.abs(dl - sl) / np.maximum(np.abs(dl), 1e-9)))
    speedup = d["median_s"] / s["median_s"]
    print(json.dumps({
        "dense_median_s": d["median_s"], "sparse_median_s": s["median_s"],
        "speedup": round(speedup, 3),
        "dense_epochs": d["epoch_times_s"], "sparse_epochs": s["epoch_times_s"],
        "loss_rel_delta": rel,
        "loss_match": bool(rel < 1e-5),
    }, indent=2))
    assert rel < 1e-5, f"dense vs sparse loss diverged: rel={rel}"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["dense", "sparse"])
    args = ap.parse_args()
    if args.mode:
        run_mode(args.mode)
    else:
        orchestrate()

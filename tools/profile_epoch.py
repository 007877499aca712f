# coding: utf-8
"""Trace one CIKM Foodcom-scale training epoch and print an HLO self-time
breakdown (the PARITY.md profile table source).

Usage: python tools/profile_epoch.py [--trace_dir /tmp/foodrec_trace]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/foodrec_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import bench

    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax

    data_path = bench.ensure_dataset()
    cfg = Config(model="CIKM_Model", dataset=bench.DATASET,
                 config_dict={"data_path": data_path, "neg_sample_num": 500,
                              "seed": 999})
    derive_data_paths(cfg, bench.DATASET)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)

    params = model.init_params(jax.random.PRNGKey(999))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    t0 = time.time()
    params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
    jax.block_until_ready(parts)
    import numpy as _np
    print(f"# warmup: {time.time() - t0:.1f}s  loss_parts="
          f"{_np.asarray(parts)}  n_batches={trainer.n_batches}",
          file=sys.stderr)

    key, k = jax.random.split(key)
    with jax.profiler.trace(args.trace_dir):
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
        jax.block_until_ready(parts)

    xplanes = sorted(glob.glob(os.path.join(
        args.trace_dir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    summarize(xplanes[-1], args.top)


def summarize(xplane, top):
    """Group device self-time by HLO op category / name prefix."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        try:
            from tensorboard_plugin_profile.convert import (
                raw_to_tool_data as rtd)
        except ImportError:
            print(f"xprof tooling unavailable; raw trace at {xplane}")
            return
    import json

    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    ids = [c["id"] for c in d["cols"]]
    ti = ids.index("total_self_time")       # microseconds
    ci = ids.index("category")
    ni = ids.index("hlo_op_name")
    agg = {}
    total = 0.0
    for row in d["rows"]:
        c = row["c"]
        t = c[ti]["v"] or 0.0
        total += t
        cat = c[ci]["v"] or "?"
        name = (c[ni]["v"] or "")[:56]
        agg.setdefault(cat, [0.0, {}])
        agg[cat][0] += t
        names = agg[cat][1]
        names[name] = names.get(name, 0.0) + t
    print(f"total device self time: {total/1e6:.3f}s")
    for cat, (t, names) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"{t/total*100:5.1f}%  {t/1e6:7.3f}s  {cat}")
        for n, tt in sorted(names.items(), key=lambda kv: -kv[1])[:top]:
            print(f"            {tt/1e6:7.3f}s    {n}")


if __name__ == "__main__":
    main()

"""Measure the torch reference's training step cost for any model at any
parity scale — the number that decides which at-scale parity runs fit a
1-core CPU budget (bench_reference.py measures CIKM_Model only).

Reuses parity_check's reference setup (scipy dok shim, torch_geometric
stub, FoodRec Config/FoodData/TrainDataLoader) and times `calculate_loss`
+ backward + Adam through the reference's own DataLoader, exactly like
bench_reference.py does for CIKM (median of N timed steps after warmup).

Usage:
    python tools/ref_step_cost.py --model PRICAI_ModelX --scale foodcom \
        [--steps 8] [--warmup 2]
Prints one JSON line: {"model":..., "scale":..., "step_s":..., "n_batches":...,
"epoch_s":..., "fix15_h": ...}.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import parity_check as pc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="PRICAI_ModelX")
    ap.add_argument("--scale", default="foodcom",
                    choices=["toy", "foodcom", "allrecipes"])
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--seed", type=int, default=999)
    args = ap.parse_args()

    pc.select_scale(args.scale)
    data_path = pc.ensure_dataset()

    sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    os.chdir("/root/reference/FoodRec")
    try:
        import torch

        pc.patch_scipy_dok()
        pc.install_torch_geometric_stub()
        from FoodRec.utils.configurator import Config

        config = Config(model=args.model, dataset=pc.DS,
                        config_dict={"gpu_id": 0, "use_gpu": False,
                                     "data_path": data_path,
                                     "neg_sample_num": pc.SCALE["neg_num"],
                                     **pc._merged_overrides(args.model)},
                        mg=False)
        base = data_path + pc.DS + "/processed_dataset/"
        config["interaction_data_path"] = base
        config["graph_data_path"] = base + "graph_edge/"
        config["ingre_data_path"] = base

        from FoodRec.utils.dataset import FoodData

        torch.manual_seed(args.seed)
        np.random.seed(args.seed)
        t0 = time.time()
        dataset = FoodData(config)
        print(f"# dataset load: {time.time() - t0:.1f}s", file=sys.stderr)

        import importlib

        mod = importlib.import_module(f"FoodRec.models.{args.model.lower()}")
        model = getattr(mod, args.model)(config, dataset)
        from torch.utils.data import DataLoader, RandomSampler

        from FoodRec.utils.dataloader import TrainDataLoader

        td = TrainDataLoader(config, dataset)
        bs = config["train_batch_size"]
        dl = DataLoader(td, batch_size=bs, sampler=RandomSampler(td))
        n_batches = (len(td) + bs - 1) // bs
        opt = torch.optim.Adam(model.parameters(),
                               lr=config["learning_rate"])
        model.train()

        times = []
        it = iter(dl)
        for step in range(args.warmup + args.steps):
            batch = next(it)
            t0 = time.time()
            opt.zero_grad()
            losses = model.calculate_loss(batch)
            loss = sum(losses) if isinstance(losses, tuple) else losses
            loss.backward()
            opt.step()
            dt = time.time() - t0
            if step >= args.warmup:
                times.append(dt)
            print(f"# step {step}: {dt:.3f}s loss={float(loss):.4f}",
                  file=sys.stderr)
        step_s = float(np.median(times))
        out = {"model": args.model, "scale": args.scale,
               "step_s": round(step_s, 4), "n_batches": n_batches,
               "epoch_s": round(step_s * n_batches, 1),
               "fix15_h": round(step_s * n_batches * 15 / 3600, 2)}
        print(json.dumps(out))
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()

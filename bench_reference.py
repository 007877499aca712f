# coding: utf-8
"""Measure the PyTorch reference's CIKM_Model training throughput on CPU over
the SAME synthetic Foodcom-scale dataset bench.py uses, and cache the result
in bench_baseline.json (consumed by bench.py's vs_baseline).

Methodology: drives the reference's own stack unmodified — its Config/yaml,
FoodData loaders, TrainDataLoader (host-side per-sample negative sampling,
FoodRec/utils/dataloader.py:50-115), model forward/backward and Adam step —
exactly the hot loop of FoodRec/common/trainer.py:156-229, timed per step
after warmup and extrapolated to the full epoch (a full CPU epoch takes tens
of minutes; per-step timing after warmup is representative because every step
does identical dense work).

Run:  python bench_reference.py          (torch CPU; no TPU involved)
"""

import json
import os
import sys
import time

N_WARMUP = 3
N_TIMED = 20

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def main():
    sys.path.insert(0, REPO_ROOT)
    from bench import BENCH_ROOT, DATASET, ensure_dataset

    data_path = ensure_dataset()

    sys.path.insert(0, "/root/reference")
    os.chdir("/root/reference/FoodRec")  # reference Config reads cwd/configs

    import torch

    # the reference calls scipy's removed private dok_matrix._update
    # (cikm_model.py:122 etc.); restore it for this process only. MUST route
    # through dok __setitem__ — the r1 `dict.update` shim left the adjacency
    # EMPTY (see PARITY.md), which also made the reference's sparse mm
    # artificially cheap and its epoch time ~overstated in our favor's
    # mirror: the r2 baseline (794s) was measured with zeroed graphs.
    from parity_check import patch_scipy_dok

    patch_scipy_dok()

    from FoodRec.utils.configurator import Config

    config = Config(model="CIKM_Model", dataset=DATASET,
                    config_dict={"gpu_id": 0, "use_gpu": False,
                                 "data_path": data_path,
                                 "neg_sample_num": 500}, mg=False)
    base = config["data_path"] + DATASET + "/processed_dataset/"
    config["interaction_data_path"] = base
    config["graph_data_path"] = base + "graph_edge/"
    config["ingre_data_path"] = base

    from FoodRec.utils.dataset import FoodData

    t0 = time.time()
    dataset = FoodData(config)
    print(f"# reference dataset load: {time.time() - t0:.1f}s")

    from FoodRec.models.cikm_model import CIKM_Model

    t0 = time.time()
    model = CIKM_Model(config, dataset).to(config["device"])
    print(f"# reference model build: {time.time() - t0:.1f}s")

    from torch.utils.data import DataLoader, RandomSampler

    from FoodRec.utils.dataloader import TrainDataLoader

    td = TrainDataLoader(config, dataset)
    dl = DataLoader(td, batch_size=config["train_batch_size"],
                    sampler=RandomSampler(td))
    n_batches = -(-len(td) // config["train_batch_size"])

    optimizer = torch.optim.Adam(model.parameters(),
                                 lr=config["learning_rate"])
    model.train()

    times = []
    it = iter(dl)
    for step in range(N_WARMUP + N_TIMED):
        t0 = time.time()
        batch = next(it)
        optimizer.zero_grad()
        losses = model.calculate_loss(batch)
        loss = sum(losses)
        loss.backward()
        optimizer.step()
        dt = time.time() - t0
        if step >= N_WARMUP:
            times.append(dt)
        print(f"# step {step}: {dt:.3f}s loss={float(loss):.3f}", flush=True)

    times.sort()
    step_s = times[len(times) // 2]
    epoch_s = step_s * n_batches

    entry = {
        "cikm_cpu_epoch_s": round(epoch_s, 2),
        "cikm_cpu_step_s": round(step_s, 4),
        "n_batches": n_batches,
        "torch_version": torch.__version__,
        "method": f"median of {N_TIMED} timed steps (after {N_WARMUP} "
                  "warmup) through the reference's own TrainDataLoader + "
                  "calculate_loss + Adam on CPU, x n_batches",
    }
    # per-dataset entries so the Foodcom and Allrecipes anchors coexist
    # (bench.py reads baseline[DATASET]); legacy flat keys kept for Foodcom
    path = os.path.join(REPO_ROOT, "bench_baseline.json")
    baseline = {}
    if os.path.isfile(path):
        with open(path) as f:
            old = json.load(f)
        baseline = {k: v for k, v in old.items() if isinstance(v, dict)}
        if "cikm_cpu_epoch_s" in old and "FoodcomSynth" not in baseline:
            baseline["FoodcomSynth"] = {
                k: v for k, v in old.items() if not isinstance(v, dict)}
    baseline[DATASET] = entry
    with open(path, "w") as f:
        json.dump(baseline, f, indent=2, sort_keys=True)
    print(json.dumps({DATASET: entry}))


if __name__ == "__main__":
    main()

# coding: utf-8
"""Accuracy-parity harness: train the PyTorch reference (CPU) and foodrec-tpu
on the SAME structured synthetic dataset with the same hyperparameters, then
evaluate both through the SAME by-user protocol and report deltas.

The reference's per-user eval loop re-runs its full graph forward per user
for models without graph_inference_fast, so for both frameworks we extract
the propagated user/item embedding matrices once and score candidates with
foodrec-tpu's evaluator — identical metric code on both sides isolates the
*training* dynamics as the only difference (RNG streams differ, so parity is
statistical, not bit-exact; BASELINE.md tolerance is ±0.5% at convergence on
the real datasets).

    python parity_check.py [--model LightGCN] [--epochs 30]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
DS_ROOT = "/tmp/foodrec_parity"
DS = "StructSynth"

SCALE = dict(n_users=800, n_items=1600, n_ingredients=300, n_cal_levels=20,
             n_health_levels=6, n_clusters=50, img_dim=64, txt_dim=32,
             neg_num=100, latent_dim=8, train_per_user=(10, 21),
             valid_per_user=(2, 4), test_per_user=(2, 5), seed=17)


def ensure_dataset():
    from foodrec_tpu.data import synthetic

    root = os.path.join(DS_ROOT, DS)
    if not os.path.isfile(os.path.join(root, "processed_dataset",
                                       "data.train.rating")):
        synthetic.generate(root, **SCALE)
    return DS_ROOT + "/"


def eval_embeddings(user_emb, item_emb, eval_set, neg_num):
    """Score candidates from fixed embedding matrices with our evaluator."""
    import jax.numpy as jnp

    from foodrec_tpu.engine.evaluator import evaluate_by_user

    u = jnp.asarray(user_emb)
    i = jnp.asarray(item_emb)

    def score_fn(users, cand):
        return jnp.einsum("bd,bcd->bc", u[users], i[cand])

    _, metrics = evaluate_by_user(score_fn, eval_set, neg_num, batch_size=128)
    return metrics


def best_upon_valid(evaluate_at, epochs, eval_each=10):
    """Generic best-on-valid sweep: `evaluate_at(n)` trains up to epoch n
    cumulatively and returns (valid_metrics, test_metrics); returns the test
    metrics at the epoch with the best valid NDCG@20 (the reference's
    early-stopping selection metric, overall.yaml:33)."""
    best_v, best_t, best_e = -1.0, None, 0
    for n in range(eval_each, epochs + 1, eval_each):
        v, t = evaluate_at(n)
        if v["NDCG@20"] > best_v:
            best_v, best_t, best_e = v["NDCG@20"], t, n
    return best_t, best_e


def run_ours(data_path, model_name, epochs, seed):
    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax

    cfg = Config(model=model_name, dataset=DS,
                 config_dict={"data_path": data_path,
                              "neg_sample_num": SCALE["neg_num"],
                              "seed": seed, "epochs": epochs})
    derive_data_paths(cfg, DS)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model(model_name)(cfg, data)
    trainer = Trainer(cfg, model)

    params = model.init_params(jax.random.PRNGKey(seed))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(0)
    # compile warmup on SEPARATE throwaway state (the epoch donates its
    # params/opt_state buffers) so `wall` is pure run time
    _p = model.init_params(jax.random.PRNGKey(1))
    _o = trainer.optimizer.init(_p)
    _p, _o, _parts = trainer._epoch_fn(_p, _o, jax.random.PRNGKey(1))
    jax.block_until_ready(_parts)
    t0 = time.time()
    for _ in range(epochs):
        key, k = jax.random.split(key)
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
    jax.block_until_ready(parts)
    wall = time.time() - t0

    # jitted + buffer-bound eval cache (same embeddings the trained eval
    # path scores with; BM3's includes the predictor like inference_by_user)
    user_emb, item_emb = trainer._cache_fn(params)[:2]
    metrics = eval_embeddings(np.asarray(user_emb), np.asarray(item_emb),
                              data.device_data.eval_test, SCALE["neg_num"])
    return metrics, wall, data


def run_reference(data_path, model_name, epochs, seed, eval_test):
    sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    os.chdir("/root/reference/FoodRec")
    try:
        import torch

        import scipy.sparse as sp

        if not hasattr(sp.dok_matrix, "_update"):
            sp.dok_matrix._update = lambda self, d: dict.update(self, d)

        from FoodRec.utils.configurator import Config

        config = Config(model=model_name, dataset=DS,
                        config_dict={"gpu_id": 0, "use_gpu": False,
                                     "data_path": data_path,
                                     "neg_sample_num": SCALE["neg_num"],
                                     "epochs": epochs}, mg=False)
        base = data_path + DS + "/processed_dataset/"
        config["interaction_data_path"] = base
        config["graph_data_path"] = base + "graph_edge/"
        config["ingre_data_path"] = base

        from FoodRec.utils.dataset import FoodData

        torch.manual_seed(seed)
        np.random.seed(seed)
        dataset = FoodData(config)
        import importlib

        mod = importlib.import_module(f"FoodRec.models.{model_name.lower()}")
        model = getattr(mod, model_name)(config, dataset)

        from torch.utils.data import DataLoader, RandomSampler

        from FoodRec.utils.dataloader import TrainDataLoader

        td = TrainDataLoader(config, dataset)
        dl = DataLoader(td, batch_size=config["train_batch_size"],
                        sampler=RandomSampler(td))
        opt = torch.optim.Adam(model.parameters(),
                               lr=config["learning_rate"])
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lr_lambda=lambda e: config["learning_rate_scheduler"][0]
            ** (e / config["learning_rate_scheduler"][1]))
        model.train()
        t0 = time.time()
        for _ in range(epochs):
            for batch in dl:
                opt.zero_grad()
                loss = sum(model.calculate_loss(batch))
                loss.backward()
                opt.step()
            sched.step()
        wall = time.time() - t0

        model.eval()
        with torch.no_grad():
            if model_name == "BM3":
                # BM3 has no forward(); inference applies the predictor to
                # the gnn encodings (reference bm3.py:152-159)
                u, i = model.gnn_encode()
                out = (model.predictor(u), model.predictor(i))
            else:
                out = model.forward()
        user_emb = out[0].detach().numpy()
        item_emb = out[1].detach().numpy()
        metrics = eval_embeddings(user_emb, item_emb, eval_test,
                                  SCALE["neg_num"])
        return metrics, wall
    finally:
        os.chdir(cwd)


def run_ours_early_stop(data_path, model_name, epochs, seed, eval_each=10):
    """Best-upon-valid protocol for ours."""
    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax

    cfg = Config(model=model_name, dataset=DS,
                 config_dict={"data_path": data_path,
                              "neg_sample_num": SCALE["neg_num"],
                              "seed": seed, "epochs": epochs})
    derive_data_paths(cfg, DS)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model(model_name)(cfg, data)
    trainer = Trainer(cfg, model)

    state = {"params": model.init_params(jax.random.PRNGKey(seed)),
             "key": jax.random.PRNGKey(0), "epoch": 0}
    state["opt"] = trainer.optimizer.init(state["params"])

    def evaluate_at(n):
        while state["epoch"] < n:
            state["key"], k = jax.random.split(state["key"])
            state["params"], state["opt"], _ = trainer._epoch_fn(
                state["params"], state["opt"], k)
            state["epoch"] += 1
        u, i = trainer._cache_fn(state["params"])[:2]
        u, i = np.asarray(u), np.asarray(i)
        v = eval_embeddings(u, i, data.device_data.eval_valid,
                            SCALE["neg_num"])
        t = eval_embeddings(u, i, data.device_data.eval_test,
                            SCALE["neg_num"])
        return v, t

    best, best_e = best_upon_valid(evaluate_at, epochs)
    return best, best_e, data


def run_reference_early_stop(data_path, model_name, epochs, seed, dd,
                             eval_each=10):
    """Best-upon-valid protocol for the torch reference (same selection)."""
    sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    os.chdir("/root/reference/FoodRec")
    try:
        import torch

        import scipy.sparse as sp

        if not hasattr(sp.dok_matrix, "_update"):
            sp.dok_matrix._update = lambda self, d: dict.update(self, d)

        from FoodRec.utils.configurator import Config

        config = Config(model=model_name, dataset=DS,
                        config_dict={"gpu_id": 0, "use_gpu": False,
                                     "data_path": data_path,
                                     "neg_sample_num": SCALE["neg_num"],
                                     "epochs": epochs}, mg=False)
        base = data_path + DS + "/processed_dataset/"
        config["interaction_data_path"] = base
        config["graph_data_path"] = base + "graph_edge/"
        config["ingre_data_path"] = base

        from FoodRec.utils.dataset import FoodData

        torch.manual_seed(seed)
        np.random.seed(seed)
        dataset = FoodData(config)
        import importlib

        mod = importlib.import_module(f"FoodRec.models.{model_name.lower()}")
        model = getattr(mod, model_name)(config, dataset)

        from torch.utils.data import DataLoader, RandomSampler

        from FoodRec.utils.dataloader import TrainDataLoader

        td = TrainDataLoader(config, dataset)
        dl = DataLoader(td, batch_size=config["train_batch_size"],
                        sampler=RandomSampler(td))
        opt = torch.optim.Adam(model.parameters(),
                               lr=config["learning_rate"])
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lr_lambda=lambda e: config["learning_rate_scheduler"][0]
            ** (e / config["learning_rate_scheduler"][1]))
        state = {"epoch": 0}

        def embeddings():
            model.eval()
            with torch.no_grad():
                if model_name == "BM3":
                    u, i = model.gnn_encode()
                    out = (model.predictor(u), model.predictor(i))
                else:
                    out = model.forward()
            return out[0].detach().numpy(), out[1].detach().numpy()

        def evaluate_at(n):
            model.train()
            while state["epoch"] < n:
                for batch in dl:
                    opt.zero_grad()
                    loss = sum(model.calculate_loss(batch))
                    loss.backward()
                    opt.step()
                sched.step()
                state["epoch"] += 1
            u, i = embeddings()
            return (eval_embeddings(u, i, dd.eval_valid, SCALE["neg_num"]),
                    eval_embeddings(u, i, dd.eval_test, SCALE["neg_num"]))

        return best_upon_valid(evaluate_at, epochs)
    finally:
        os.chdir(cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LightGCN")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--early_stop", action="store_true",
                    help="best-upon-valid protocol for both frameworks")
    args = ap.parse_args()

    data_path = ensure_dataset()
    if args.early_stop:
        ours, oe, data = run_ours_early_stop(data_path, args.model,
                                             args.epochs, args.seed)
        print(f"ours     (best@{oe:3d}ep): {json.dumps(ours)}", flush=True)
        ref, re_ = run_reference_early_stop(data_path, args.model,
                                            args.epochs, args.seed,
                                            data.device_data)
        print(f"reference(best@{re_:3d}ep): {json.dumps(ref)}", flush=True)
        deltas = {k: round(ours[k] - ref[k], 4) for k in ours}
        rel = {k: (round((ours[k] - ref[k]) / ref[k] * 100, 2)
                   if ref[k] else None) for k in ours}
        print("delta(abs):", json.dumps(deltas))
        print("delta(%):  ", json.dumps(rel))
        return

    ours, ours_wall, data = run_ours(data_path, args.model, args.epochs,
                                     args.seed)
    print(f"ours     ({ours_wall:6.1f}s): {json.dumps(ours)}", flush=True)
    ref, ref_wall = run_reference(data_path, args.model, args.epochs,
                                  args.seed, data.device_data.eval_test)
    print(f"reference({ref_wall:6.1f}s): {json.dumps(ref)}", flush=True)
    deltas = {k: round(ours[k] - ref[k], 4) for k in ours}
    rel = {k: (round((ours[k] - ref[k]) / ref[k] * 100, 2) if ref[k] else None)
           for k in ours}
    print("delta(abs):", json.dumps(deltas))
    print("delta(%):  ", json.dumps(rel))
    print(json.dumps({"speedup_vs_ref_cpu": round(ref_wall / ours_wall, 1)}))


if __name__ == "__main__":
    main()

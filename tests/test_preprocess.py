"""Offline pipeline (SURVEY.md §2.8): raw interactions -> on-disk contract
-> loadable by FoodData and trainable (golden-path integration)."""

import numpy as np
import pandas as pd
import pytest

from foodrec_tpu.data import preprocess as pp


def _raw(seed=0, n_users=40, n_items=80):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        for _ in range(int(rng.integers(6, 14))):
            rows.append({"user_id": 1000 + u,
                         "recipe_id": 5000 + int(rng.integers(n_items)),
                         "date": f"2020-{int(rng.integers(1, 13)):02d}-"
                                 f"{int(rng.integers(1, 29)):02d}"})
    return pd.DataFrame(rows).drop_duplicates(["user_id", "recipe_id"])


def test_k_core_filter():
    df = _raw()
    out = pp.k_core_filter(df, k=3)
    assert (out["user_id"].value_counts() >= 3).all()
    assert (out["recipe_id"].value_counts() >= 3).all()


def test_temporal_split_keeps_train_test_users():
    df = pp.k_core_filter(_raw(), k=3)
    tr, va, te = pp.temporal_split(df)
    assert set(te["user_id"]) <= set(tr["user_id"])
    # temporal: max train date <= min test date
    assert tr["date"].max() <= te["date"].min()


def test_health_criteria():
    ndf = pd.DataFrame([
        {"i": 0, "fat": 20, "sugar": 5, "sodium": 50, "protein": 12,
         "saturated_fat": 5, "carbohydrates": 60},   # all 6 pass
        {"i": 1, "fat": 50, "sugar": 50, "sodium": 200, "protein": 50,
         "saturated_fat": 50, "carbohydrates": 10},  # all fail
    ])
    score, flags = pp.build_health_levels(ndf, "/tmp/pp_health_test")
    assert score[0] == 6 and score[1] == 0
    assert flags[0].sum() == 6 and flags[1].sum() == 0


def test_full_pipeline_loads_and_trains(tmp_path):
    import jax

    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model
    from tests.conftest import make_config

    rng = np.random.default_rng(3)
    raw = _raw(seed=3)
    raw_items = sorted(set(raw["recipe_id"]))
    item_to_ingres = {r: rng.choice(200, size=int(rng.integers(2, 8)),
                                    replace=False).tolist()
                      for r in raw_items}
    img = {r: rng.normal(size=16).astype(np.float32) for r in raw_items}
    txt = {r: rng.normal(size=8).astype(np.float32) for r in raw_items}
    cals = {r: float(rng.integers(50, 900)) for r in raw_items}
    ndf = pd.DataFrame([{
        "recipe_id": r, "fat": rng.integers(0, 60),
        "sugar": rng.integers(0, 60), "sodium": rng.integers(0, 200),
        "protein": rng.integers(0, 60), "saturated_fat": rng.integers(0, 60),
        "carbohydrates": rng.integers(0, 100)} for r in raw_items])

    out = pp.build_dataset(str(tmp_path / "Pipeline"), raw, item_to_ingres,
                           img, txt, calories_by_item=cals,
                           nutrition_df=ndf, k_core=3, n_neg=20,
                           n_clusters=6)
    assert out["n_users"] > 0 and out["n_items"] > 0

    meta = {"neg_num": 20}
    cfg, _ = make_config((str(tmp_path / "Pipeline"), meta),
                         model="CIKM_Model", overrides={
        "data_path": str(tmp_path) + "/", "epochs": 1, "eval_step": 1,
        "train_batch_size": 16, "seed": 999})
    derive_data_paths(cfg, "Pipeline")
    data = FoodData(cfg)
    assert data.num_users == out["n_users"]
    assert data.num_items == out["n_items"]
    data.device_data = DeviceData.from_food_data(data, cfg)

    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)
    _, _, test_res = trainer.fit(data, saved=False, hyper_tuple=(999,))
    assert np.isfinite(list(test_res.values())).all()

    # PRICAI consumes the cluster artifacts the pipeline wrote
    cfg2, _ = make_config((str(tmp_path / "Pipeline"), meta),
                          model="PRICAI_ModelX", overrides={
        "data_path": str(tmp_path) + "/", "epochs": 1, "eval_step": 1,
        "train_batch_size": 16, "seed": 999, "n_cluster": 6,
        "use_center_embedding": True})
    derive_data_paths(cfg2, "Pipeline")
    data2 = FoodData(cfg2)
    data2.device_data = DeviceData.from_food_data(data2, cfg2)
    model2 = get_model("PRICAI_ModelX")(cfg2, data2)
    params = model2.init_params(jax.random.PRNGKey(0))
    u, i = data2.device_data.train_u[:8], data2.device_data.train_i[:8]
    import jax.numpy as jnp

    losses = model2.calculate_loss(params, {
        "u_id": jnp.asarray(u), "pos_i_id": jnp.asarray(i),
        "neg_i_id": (jnp.asarray(i) + 1) % data2.num_items,
        "weight": jnp.ones(8), "key": jax.random.PRNGKey(1)})
    assert all(np.isfinite(float(l)) for l in losses)


def test_negative_file_excludes_train_positives(tmp_path):
    rng = np.random.default_rng(0)
    # user 0's train positives are items 1 and 2; a wide item universe
    others = pd.DataFrame({"u": rng.integers(2, 20, 200),
                           "i": rng.integers(0, 40, 200)})
    train = pd.concat([pd.DataFrame({"u": [0, 0, 1], "i": [1, 2, 3]}),
                       others])
    ev = pd.DataFrame({"u": [0, 1], "i": [5, 6]})
    path = str(tmp_path / "neg.txt")
    pp.sample_eval_negatives(train, ev, 40, path, n_neg=10, seed=1)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 2
    negs0 = [int(x) for x in lines[0].split("\t")[1:]]
    assert len(negs0) == 10
    assert not ({1, 2} & set(negs0))  # user 0's train positives excluded

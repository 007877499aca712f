"""Preprocess CLI (SURVEY.md §2.8 as a runnable command): fabricated raw
trees in each supported format -> processed_dataset contract -> FoodData.

Reference semantics pinned per format:
  foodcom    — dataset_process/foodcom_process.ipynb cells 0-1 (PP-id
               restriction + image filter), 27 (keyword ii graph), 28-29
               (cal/50 buckets, 6-criterion health from the nutrition list)
  allrecipes — allrecipes_process.ipynb cells 2 (own core splits, users
               from train), 24 ('^' ingredients, singleton ii subsample),
               25 (cal/30), 26-29 (7-criterion health incl. fiber)
"""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from foodrec_tpu.data import preprocess as pp
from foodrec_tpu.data import preprocess_cli as cli

KW_NAMES = ["red pepper", "red onion", "white flour", "white sugar",
            "dry rub", "boiled egg", "minced beef", "plain salt"]


def _dates(rng, n):
    return [f"2021-{int(rng.integers(1, 13)):02d}-"
            f"{int(rng.integers(1, 29)):02d}" for _ in range(n)]


def _write_generic(raw, rng, n_users=30, n_items=40):
    os.makedirs(raw, exist_ok=True)
    rows = []
    for u in range(n_users):
        items = rng.choice(n_items, size=10, replace=False)
        for i in items:
            rows.append({"user_id": u, "item_id": int(i)})
    inter = pd.DataFrame(rows)
    inter["date"] = _dates(rng, len(inter))
    inter.to_csv(os.path.join(raw, "interactions.csv"), index=False)

    pd.DataFrame({
        "item_id": range(n_items),
        "ingredients": ["^".join(
            rng.choice(KW_NAMES, size=3, replace=False))
            for _ in range(n_items)],
    }).to_csv(os.path.join(raw, "ingredients.csv"), index=False)
    pd.DataFrame({
        "item_id": range(n_items),
        "calories": rng.integers(40, 900, n_items),
    }).to_csv(os.path.join(raw, "calories.csv"), index=False)
    pd.DataFrame({
        "item_id": range(n_items),
        "fat": rng.integers(0, 60, n_items),
        "sugar": rng.integers(0, 30, n_items),
        "sodium": rng.integers(0, 200, n_items),
        "protein": rng.integers(0, 40, n_items),
        "saturated_fat": rng.integers(0, 30, n_items),
        "carbohydrates": rng.integers(0, 100, n_items),
    }).to_csv(os.path.join(raw, "nutrition.csv"), index=False)
    return inter


def test_generic_cli_end_to_end(tmp_path):
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from tests.conftest import make_config

    raw = str(tmp_path / "raw")
    rng = np.random.default_rng(0)
    _write_generic(raw, rng)
    out = cli.main(["--format", "generic", "--raw-dir", raw,
                    "--out", str(tmp_path / "MyDS"),
                    "--k-core", "2", "--n-neg", "8", "--n-clusters", "4",
                    "--image-dim", "16", "--text-dim", "8",
                    "--health-sample-dict"])
    base = out["base"]
    gdir = os.path.join(base, "graph_edge")
    # keyword ii graph: KW_NAMES share 'red'/'white'/'dry'/... keywords
    ii = np.loadtxt(os.path.join(gdir, "ii_graph.txt"), dtype=np.int64)
    assert len(ii) > 0 and len(ii) % 2 == 0  # both directions written
    for f in ("rc_graph.txt", "rh_graph.txt", "rr_health_graph.txt",
              "ur_graph.txt", "health_sample_dict.pkl"):
        assert os.path.exists(os.path.join(gdir, f)), f
    with open(os.path.join(gdir, "health_sample_dict.pkl"), "rb") as f:
        tup = pickle.load(f)
    assert len(tup) == 7  # (neg_sample_set, health_0..health_5)
    assert sum(len(b) for b in tup[1:]) == out["n_items"]
    # mapping_dict carries the ingredient encoder (reference cell 27 shape)
    with open(os.path.join(base, "mapping_dict.pkl"), "rb") as f:
        u2i, i2i, g2i = pickle.load(f)
    assert len(u2i) == out["n_users"] and len(i2i) == out["n_items"]
    assert set(g2i.keys()) <= set(KW_NAMES)

    meta = {"neg_num": 8}
    cfg, _ = make_config((str(tmp_path / "MyDS"), meta),
                         model="CIKM_Model", overrides={
        "data_path": str(tmp_path) + "/", "seed": 999,
        "load_IngreIngre_graph": True, "load_UserRecipe_graph": True,
        "use_cal_level": True})
    derive_data_paths(cfg, "MyDS")
    data = FoodData(cfg)
    assert data.num_users == out["n_users"]
    assert data.num_items == out["n_items"]
    assert data.embImage.shape == (out["n_items"], 16)
    assert data.embText.shape == (out["n_items"], 8)
    assert len(data.iIngre_triples) == len(ii)


def _write_foodcom(raw, rng, n_users=25, n_items=30):
    os.makedirs(raw, exist_ok=True)
    rows = []
    for u in range(n_users):
        for i in rng.choice(n_items, size=9, replace=False):
            rows.append({"user_id": 100 + u, "recipe_id": 7000 + int(i),
                         "rating": int(rng.integers(1, 6))})
    inter = pd.DataFrame(rows)
    inter["date"] = _dates(rng, len(inter))
    inter.to_csv(os.path.join(raw, "RAW_interactions.csv"), index=False)

    ids = [7000 + i for i in range(n_items)]
    pd.DataFrame({
        "id": ids,
        "ingredient_ids": [str(sorted(set(
            rng.integers(0, len(KW_NAMES), 4).tolist())))
            for _ in ids],
    }).to_csv(os.path.join(raw, "PP_recipes.csv"), index=False)
    pd.DataFrame({
        "id": ids, "name": [f"recipe {i}" for i in ids],
        "nutrition": [str([float(rng.integers(40, 900)),  # cal
                           float(rng.integers(0, 60)),    # fat
                           float(rng.integers(0, 30)),    # sugar
                           float(rng.integers(0, 200)),   # sodium
                           float(rng.integers(0, 40)),    # protein
                           float(rng.integers(0, 30)),    # sat fat
                           float(rng.integers(0, 100))])  # carbs
                      for _ in ids],
    }).to_csv(os.path.join(raw, "RAW_recipes.csv"), index=False)
    # ingr_map: raw ingredient id -> processed name (enables ii + text)
    pd.DataFrame({"id": range(len(KW_NAMES)), "processed": KW_NAMES}) \
        .to_pickle(os.path.join(raw, "ingr_map.pkl"))
    return ids


def test_foodcom_cli_image_filter_and_graphs(tmp_path):
    raw = str(tmp_path / "raw")
    rng = np.random.default_rng(1)
    ids = _write_foodcom(raw, rng)
    img_dir = str(tmp_path / "images")
    os.makedirs(img_dir)
    for i in ids[:-3]:  # last 3 items have no image -> must be dropped
        open(os.path.join(img_dir, f"{i}.jpg"), "w").close()

    out = cli.main(["--format", "foodcom", "--raw-dir", raw,
                    "--out", str(tmp_path / "Foodcom"),
                    "--image-dir", img_dir, "--k-core", "2",
                    "--n-neg", "6", "--n-clusters", "4",
                    "--image-dim", "12", "--text-dim", "6"])
    base = out["base"]
    # image filter (cell 1): items without a jpg never reach the contract
    with open(os.path.join(base, "mapping_dict.pkl"), "rb") as f:
        _, item_to_idx, _ = pickle.load(f)
    assert not set(ids[-3:]) & set(item_to_idx)

    gdir = os.path.join(base, "graph_edge")
    ii = np.loadtxt(os.path.join(gdir, "ii_graph.txt"), dtype=np.int64)
    assert len(ii) > 0
    rc = np.loadtxt(os.path.join(gdir, "rc_graph.txt"), dtype=np.int64)
    # cal levels are label-encoded dense (cell 28)
    assert rc[:, 1].max() == len(np.unique(rc[:, 1])) - 1
    rh = np.loadtxt(os.path.join(gdir, "rh_graph.txt"), dtype=np.int64)
    assert rh[:, 1].max() <= 6  # 6 criteria


def test_allrecipes_cli_presplit_and_seven_criteria(tmp_path):
    raw = str(tmp_path / "raw")
    rng = np.random.default_rng(2)
    n_items = 24
    rid = [40 + i for i in range(n_items)]

    def split_df(users, per_user):
        rows = []
        for u in users:
            for i in rng.choice(n_items, size=per_user, replace=False):
                rows.append({"user_id": u, "recipe_id": rid[int(i)],
                             "rating": int(rng.integers(1, 6)),
                             "dateLastModified": "2019-01-01"})
        return pd.DataFrame(rows)

    os.makedirs(raw)
    train = split_df(range(12), 8)
    valid = split_df(range(12), 2)
    test = pd.concat([split_df(range(12), 3),
                      split_df([99], 3)])  # user 99 not in train -> dropped
    train.to_csv(os.path.join(raw, "core-data-train_rating.csv"),
                 index=False)
    valid.to_csv(os.path.join(raw, "core-data-valid_rating.csv"),
                 index=False)
    test.to_csv(os.path.join(raw, "core-data-test_rating.csv"), index=False)

    def nutri():
        return str({
            "calories": {"amount": float(rng.integers(40, 900))},
            "fat": {"percentDailyValue": str(rng.integers(0, 60))},
            "sugars": {"amount": float(rng.integers(0, 30))},
            "sodium": {"amount": float(rng.integers(0, 3000))},
            "protein": {"percentDailyValue": str(rng.integers(0, 40))},
            "saturatedFat": {"percentDailyValue": "< 1"},
            "carbohydrates": {"percentDailyValue": str(
                rng.integers(0, 100))},
            "fiber": {"percentDailyValue": str(rng.integers(0, 40))},
        })

    pd.DataFrame({
        "recipe_id": rid,
        "recipe_name": [f"dish {i}" for i in rid],
        "ingredients": ["^".join(rng.choice(KW_NAMES, size=3,
                                            replace=False))
                        for _ in rid],
        "nutritions": [nutri() for _ in rid],
    }).to_csv(os.path.join(raw, "core-data_recipe.csv"), index=False)

    out = cli.main(["--format", "allrecipes", "--raw-dir", raw,
                    "--out", str(tmp_path / "Allrecipes"),
                    "--n-neg", "6", "--n-clusters", "4",
                    "--image-dim", "12", "--text-dim", "6"])
    base = out["base"]
    # own splits kept: every train row survives (no k-core / re-split),
    # the non-train user's test rows are dropped (cell 2)
    train_lines = open(os.path.join(base, "data.train.rating")).readlines()
    assert len(train_lines) == len(train)
    assert out["n_users"] == 12
    test_lines = open(os.path.join(base, "data.test.rating")).readlines()
    assert len(test_lines) == len(test) - 3

    rh = np.loadtxt(os.path.join(base, "graph_edge", "rh_graph.txt"),
                    dtype=np.int64)
    assert rh[:, 1].max() <= 7  # 7 criteria (fiber added)
    with open(os.path.join(base, "graph_edge",
                           "recipe_health_level_multi_hot_dict.pkl"),
              "rb") as f:
        mh = pickle.load(f)
    assert all(len(v) == 7 for v in mh.values())


def test_keyword_tag_edges_rule():
    """Pairwise-per-keyword with dedup + both directions (cell 27); the
    Allrecipes singleton subsample keeps ~p of single-keyword pairs."""
    names = {0: "red hot pepper", 1: "red onion", 2: "white rice",
             3: "dry white wine", 4: "salt"}
    e = pp.keyword_tag_edges(names)
    pairs = {tuple(r) for r in e.tolist()}
    assert (0, 1) in pairs and (1, 0) in pairs      # share 'red'
    assert (2, 3) in pairs                          # share 'white'
    assert not any(4 in p for p in pairs)           # no keyword -> no edge
    # subsample off vs fully off: p=0 drops all count==1 edges, p=1 keeps
    assert len(pp.keyword_tag_edges(names, singleton_keep_p=0.0)) == 0
    np.testing.assert_array_equal(
        pp.keyword_tag_edges(names, singleton_keep_p=1.0), e)

"""Dataset-contract loading (reference parity: FoodRec/utils/dataset.py)."""

import numpy as np
import pytest

from tests.conftest import make_config


@pytest.fixture(scope="module")
def food_data(synth_root):
    from foodrec_tpu.data import FoodData

    cfg, meta = make_config(
        synth_root, model="SCHGN",
        overrides={"load_UserRecipe_graph": True, "load_RecipeIngre_graph": True,
                   "load_RecipeCalories_graph": True, "use_cal_level": True,
                   "load_IngreIngre_graph": True, "small_ingre": True,
                   "use_health_level_multi_hot": True})
    return FoodData(cfg), meta


def test_counts(food_data):
    ds, meta = food_data
    assert ds.num_users == meta["n_users"]
    assert ds.num_items == meta["n_items"]
    assert ds.n_train == meta["n_train"]
    assert ds.n_valid == meta["n_valid"]
    assert ds.n_test == meta["n_test"]
    # pad id == n_ingredients (dataset.py:53)
    assert ds.num_ingredients == meta["n_ingredients"]


def test_item_id_shift(food_data):
    """Interaction arrays carry item ids shifted by +num_users
    (dataset.py:197-199)."""
    ds, meta = food_data
    assert ds.train_data[:, 1].min() >= ds.num_users
    assert ds.test_data[:, 1].max() < ds.num_users + meta["n_items"]


def test_per_user_lists(food_data):
    ds, meta = food_data
    assert len(ds.trainList) == meta["n_users"]
    assert len(ds.testRatings) == meta["n_users"]
    assert len(ds.testNegatives) == meta["n_users"]
    assert len(ds.validRatings) == len(ds.validNegatives) == len(ds.valid_users)
    assert all(len(n) == meta["neg_num"] for n in ds.testNegatives)


def test_valid_test_exclusion_set(food_data):
    ds, meta = food_data
    for idx, u in enumerate(ds.valid_users):
        for i in ds.validRatings[idx]:
            assert i in ds.validTestRatings[u]
    for u in range(meta["n_users"]):
        for i in ds.testRatings[u]:
            assert i in ds.validTestRatings[u]


def test_graphs_loaded(food_data):
    ds, meta = food_data
    assert ds.uRecipe_triples.shape[1] == 2
    assert ds.rIngre_triples[:, 1].max() < meta["n_ingredients"]
    assert ds.num_calories_level == meta["n_cal_levels"]
    assert len(ds.cal_level) == meta["n_items"]
    assert len(ds.health_level_multi_hot[0]) == meta["n_health_levels"]


def test_train_coo_matches_train_file(food_data):
    ds, meta = food_data
    coo = ds.train_coo_matrix
    assert coo.shape == (meta["n_users"], meta["n_items"])
    pairs_file = set(zip(ds._train_u.tolist(), ds._train_i.tolist()))
    pairs_coo = set(zip(coo.row.tolist(), coo.col.tolist()))
    assert pairs_file == pairs_coo


def test_features(food_data):
    ds, meta = food_data
    assert ds.embImage.shape[0] == meta["n_items"]
    assert ds.embText.shape[0] == meta["n_items"]
    assert ds.ingredientCodeDict.shape == (meta["n_items"], 20)
    assert len(ds.ingredientNum) == meta["n_items"]
    # codes beyond ingre_num are the pad id
    for i in range(meta["n_items"]):
        k = ds.ingredientNum[i]
        assert np.all(ds.ingredientCodeDict[i, k:] == meta["n_ingredients"])


def test_cold_items(food_data):
    ds, _ = food_data
    train_items = set(ds._train_i.tolist())
    for c in ds.cold_list:
        assert c not in train_items

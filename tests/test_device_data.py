"""Device data layer: bitmap exclusion, eval padding, on-chip sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_config


@pytest.fixture(scope="module")
def bundle(synth_root):
    from foodrec_tpu.data import DeviceData, FoodData

    cfg, meta = make_config(
        synth_root, model="SCHGN",
        overrides={"load_UserRecipe_graph": True, "load_RecipeIngre_graph": True,
                   "load_RecipeCalories_graph": True, "use_cal_level": True,
                   "small_ingre": True})
    ds = FoodData(cfg)
    return DeviceData.from_food_data(ds, cfg), ds, meta


def test_bitmap_covers_all_positives(bundle):
    from foodrec_tpu.data.sampling import is_excluded

    dd, ds, meta = bundle
    bitmap = jnp.asarray(dd.excl_bitmap)
    for u in range(meta["n_users"]):
        pos = set(ds.trainList[u]) | ds.validTestRatings[u]
        items = jnp.arange(meta["n_items"], dtype=jnp.int32)
        users = jnp.full_like(items, u)
        got = np.asarray(is_excluded(bitmap, users, items))
        want = np.array([i in pos for i in range(meta["n_items"])])
        np.testing.assert_array_equal(got, want)


def test_negative_sampling_never_hits_positives(bundle):
    from foodrec_tpu.data.sampling import sample_negatives

    dd, ds, meta = bundle
    bitmap = jnp.asarray(dd.excl_bitmap)
    users = jnp.asarray(np.tile(np.arange(meta["n_users"]), 50), dtype=jnp.int32)
    negs = np.asarray(sample_negatives(jax.random.key(0), users, bitmap,
                                       dd.num_items))
    assert negs.min() >= 0 and negs.max() < meta["n_items"]
    for u, n in zip(np.asarray(users), negs):
        assert n not in ds.trainList[u]
        assert n not in ds.validTestRatings[u]


def test_eval_set_layout(bundle):
    dd, ds, meta = bundle
    ev = dd.eval_test
    assert ev.n_users == meta["n_users"]
    assert ev.width % 128 == 0
    for idx in range(ev.n_users):
        npos = ev.n_pos[idx]
        assert list(ev.cand[idx, :npos]) == list(ds.testRatings[idx])
        # negatives region excludes every positive
        negs = set(ev.cand[idx, npos:ev.n_cand[idx]].tolist())
        assert not negs & set(ds.testRatings[idx])


def test_ssl_mask_semantics(bundle):
    from foodrec_tpu.data.sampling import ssl_mask_ingredients

    dd, _, meta = bundle
    codes = jnp.asarray(dd.ingre_codes)
    num = jnp.asarray(dd.ingre_num)
    n_ing = meta["n_ingredients"]
    masked, pos, neg = ssl_mask_ingredients(jax.random.key(1), codes, num, n_ing)
    masked, pos, neg = np.asarray(masked), np.asarray(pos), np.asarray(neg)
    np.testing.assert_array_equal(pos, np.asarray(codes))
    is_masked = masked == n_ing + 1
    assert is_masked.any()  # p=0.2 over hundreds of slots
    codes_np = np.asarray(codes)
    num_np = np.asarray(num)
    for i in range(codes_np.shape[0]):
        real = codes_np[i, :num_np[i]]
        for j in range(codes_np.shape[1]):
            if is_masked[i, j]:
                assert j < num_np[i]  # only real positions masked
                assert neg[i, j] not in set(real.tolist())
            else:
                assert masked[i, j] == codes_np[i, j]
                assert neg[i, j] == codes_np[i, j]

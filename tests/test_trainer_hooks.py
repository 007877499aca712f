"""Config-gated trainer hooks:

* `health_neg_sample` emits a health-stratified second negative into every
  train batch (reference dataloader.py:22-25, 87-114 — `health_neg*` fields;
  bucket pickle `health_sample_dict.pkl`)
* `calcu_cos_similarity` runs the embedding/grad cosine probe each batch and
  accumulates over the epoch (reference trainer.py:216-220, 584-629)
"""

import jax
import numpy as np

from tests.conftest import make_config


def _build(synth_root, model_name, overrides):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, meta = make_config(synth_root, model=model_name, overrides=overrides)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model(model_name)(cfg, data)
    return cfg, data, model, Trainer(cfg, model)


def test_health_neg_in_train_batch(synth_root):
    """With the flag set, every train batch carries a valid `health_neg`:
    excluded from the user's positives, and drawn from the positive item's
    health bucket for users in neg_sample_set."""
    cfg, data, model, trainer = _build(
        synth_root, "LightGCN",
        {"epochs": 1, "train_batch_size": 16, "use_health_level": True,
         "health_neg_sample": True})
    dd = data.device_data
    assert dd.health_bucket_items is not None
    assert dd.health_in_sample is not None and dd.train_items_arr is not None
    # neg_sample_set = even users (synthetic.py)
    assert dd.health_in_sample[0] and not dd.health_in_sample[1]

    seen = {}
    orig = model.calculate_loss

    def spy(params, batch):
        seen["has_health_neg"] = "health_neg" in batch
        if "health_neg" in batch:
            seen.setdefault("shapes", set()).add(batch["health_neg"].shape)
        return orig(params, batch)

    model.calculate_loss = spy
    try:
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = trainer.optimizer.init(params)
        params, _, parts = trainer._epoch_fn(params, opt_state,
                                             jax.random.PRNGKey(1))
    finally:
        model.calculate_loss = orig
    assert seen["has_health_neg"]
    # full-size batches plus (when n_train % bs != 0) the exact-size tail
    rem = dd.n_train % 16
    expect = {(16,)} | ({(rem,)} if rem else set())
    assert seen["shapes"] == expect
    assert np.isfinite(np.asarray(parts)).all()

    # draw once directly and verify the invariants on real data
    from foodrec_tpu.data.sampling import (
        is_excluded, sample_health_stratified_negatives)
    import jax.numpy as jnp

    u = jnp.asarray(dd.train_u[:64])
    i = jnp.asarray(dd.train_i[:64])
    neg = sample_health_stratified_negatives(
        jax.random.PRNGKey(7), u, i, jnp.asarray(dd.excl_bitmap),
        jnp.asarray(dd.health_level), jnp.asarray(dd.health_bucket_items),
        jnp.asarray(dd.health_in_sample), jnp.asarray(dd.train_items_arr))
    neg = np.asarray(neg)
    assert not np.asarray(
        is_excluded(jnp.asarray(dd.excl_bitmap), u, jnp.asarray(neg))).any()
    # users in the sample set: negative's health level == positive's level
    # (unless that bucket had no admissible item — not the case here)
    hl = dd.health_level
    in_set = np.asarray(dd.health_in_sample)[np.asarray(u)]
    pos_lvl = hl[np.asarray(i)]
    neg_lvl = hl[neg]
    match = (neg_lvl == pos_lvl)[in_set]
    assert match.mean() > 0.9  # all buckets non-empty in the fixture


def test_health_neg_off_by_default(synth_root):
    _, data, model, trainer = _build(
        synth_root, "LightGCN", {"epochs": 1, "train_batch_size": 16})
    assert data.device_data.health_bucket_items is None

    seen = {}
    orig = model.calculate_loss

    def spy(params, batch):
        seen["has_health_neg"] = "health_neg" in batch
        return orig(params, batch)

    model.calculate_loss = spy
    try:
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = trainer.optimizer.init(params)
        trainer._epoch_fn(params, opt_state, jax.random.PRNGKey(1))
    finally:
        model.calculate_loss = orig
    assert seen["has_health_neg"] is False


def test_cos_similarity_probe_mismatched_dims_is_graceful(synth_root):
    """Fixture has img_dim=16 / txt_dim=8: no same-dim triple exists, so
    diagnostic_embeddings returns None and the probe logs zeros instead of
    crashing (the reference would AttributeError on its shipped models)."""
    cfg, data, model, trainer = _build(
        synth_root, "CIKM_Model",
        {"epochs": 1, "train_batch_size": 16, "embedding_size": 16,
         "calcu_cos_similarity": True})
    params = model.init_params(jax.random.PRNGKey(0))
    assert model.diagnostic_embeddings(params) is None
    opt_state = trainer.optimizer.init(params)
    trainer._epoch_fn(params, opt_state, jax.random.PRNGKey(1))
    sim = trainer._epoch_cos_sim
    assert sim is not None and sim.shape == (6,)
    assert (sim == 0).all()

    # flag off -> no accumulator
    cfg2, data2, model2, trainer2 = _build(
        synth_root, "CIKM_Model",
        {"epochs": 1, "train_batch_size": 16, "embedding_size": 16})
    p2 = model2.init_params(jax.random.PRNGKey(0))
    trainer2._epoch_fn(p2, trainer2.optimizer.init(p2), jax.random.PRNGKey(1))
    assert trainer2._epoch_cos_sim is None


def test_cos_similarity_probe_matching_dims(tmp_path):
    """With img_dim = txt_dim = embedding_size the (id, text, image) triple
    exists and the accumulated 6-vector is finite and nonzero."""
    from foodrec_tpu.data import synthetic
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.config import Config
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    root = tmp_path / "SynthEq"
    meta = synthetic.generate(str(root), n_users=12, n_items=30,
                              img_dim=16, txt_dim=16, neg_num=5)
    cfg = Config(model="CIKM_Model", dataset="SynthEq",
                 config_dict={"data_path": str(tmp_path) + "/",
                              "neg_sample_num": meta["neg_num"],
                              "epochs": 1, "train_batch_size": 8,
                              "embedding_size": 16,
                              "calcu_cos_similarity": True})
    derive_data_paths(cfg, "SynthEq")
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)

    params = model.init_params(jax.random.PRNGKey(0))
    emb = model.diagnostic_embeddings(params)
    assert emb is not None and len(emb) == 3
    trainer._epoch_fn(params, trainer.optimizer.init(params),
                      jax.random.PRNGKey(1))
    sim = trainer._epoch_cos_sim
    assert sim is not None and np.isfinite(sim).all()
    assert np.abs(sim).max() > 0

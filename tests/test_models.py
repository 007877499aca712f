"""Model zoo smoke + training tests on the synthetic dataset: every model
must init, produce finite multi-part losses, train a few epochs, and score
candidates (SURVEY.md §2.7 inventory)."""

import jax
import numpy as np
import pytest

from tests.conftest import make_config

MODEL_OVERRIDES = {
    "LightGCN": {},
    "BM3": {},
    "CIKM_Model": {},
    "PRICAI_ModelX": {"n_cluster": 5},  # synthetic fixture has 5 clusters
    "SCHGN": {},
    "FGCN": {},
}


def _load(synth_root, model, overrides=None):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData

    cfg, meta = make_config(synth_root, model=model, overrides={
        "epochs": 3, "eval_step": 3, "train_batch_size": 16,
        "stopping_step": 10, "seed": 999, **(overrides or {})})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    return cfg, data


def _available_models():
    from foodrec_tpu.models import get_model

    out = []
    for name in MODEL_OVERRIDES:
        try:
            get_model(name)
            out.append(name)
        except (ImportError, ModuleNotFoundError, ValueError):
            pass
    return out


@pytest.mark.parametrize("name", _available_models())
def test_model_trains_and_scores(synth_root, name):
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, data = _load(synth_root, name, MODEL_OVERRIDES[name])
    model = get_model(name)(cfg, data)

    params = model.init_params(jax.random.PRNGKey(0))
    batch_u = jax.numpy.asarray(data.device_data.train_u[:16])
    batch_i = jax.numpy.asarray(data.device_data.train_i[:16])
    batch = {"u_id": batch_u, "pos_i_id": batch_i,
             "neg_i_id": (batch_i + 1) % data.num_items,
             "weight": jax.numpy.ones(16),
             "key": jax.random.PRNGKey(1)}
    losses = model.calculate_loss(params, batch)
    assert isinstance(losses, tuple)
    for l in losses:
        assert np.isfinite(float(l)), (name, losses)

    trainer = Trainer(cfg, model)
    best_valid, valid_res, test_res = trainer.fit(data, saved=False,
                                                  hyper_tuple=(999,))
    assert np.isfinite(list(test_res.values())).all(), (name, test_res)
    losses = [trainer.train_loss_dict[e]
              for e in sorted(trainer.train_loss_dict)]
    assert np.isfinite(losses).all(), (name, losses)


@pytest.mark.parametrize("name", _available_models())
def test_model_loss_decreases(synth_root, name):
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, data = _load(synth_root, name, {
        **MODEL_OVERRIDES[name],
        "epochs": 10, "eval_step": 10, "learning_rate": 0.01})
    model = get_model(name)(cfg, data)
    trainer = Trainer(cfg, model)
    trainer.fit(data, saved=False, hyper_tuple=(999,))
    losses = [trainer.train_loss_dict[e]
              for e in sorted(trainer.train_loss_dict)]
    assert losses[-1] < losses[0], (name, losses)


@pytest.mark.parametrize("name", ["CIKM_Model", "BM3"])
def test_freeze_modality_tables(synth_root, name):
    """Opt-in frozen modality tables: the big raw-feature copies leave the
    param pytree (and thus the optimizer), scoring still works."""
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, data = _load(synth_root, name, {
        **MODEL_OVERRIDES[name], "freeze_modality_tables": True})
    model = get_model(name)(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "image_embedding" not in params
    assert "text_embedding" not in params

    trainer = Trainer(cfg, model)
    _, _, test_res = trainer.fit(data, saved=False, hyper_tuple=(999,))
    assert np.isfinite(list(test_res.values())).all()

"""Mirror-Gradient trainer option (reference trainer.py:195-211 + mg.yaml):
every beta-th batch steps on alpha1*loss then applies -alpha2*loss on the
replayed batch."""

import jax
import numpy as np

from tests.conftest import make_config


def test_mg_two_pass_updates(synth_root):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, _ = make_config(synth_root, model="LightGCN", overrides={
        "epochs": 2, "train_batch_size": 16, "seed": 999,
        "alpha1": 1.0, "alpha2": 0.1, "beta": 2})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("LightGCN")(cfg, data)

    results = {}
    for mg in (False, True):
        trainer = Trainer(cfg, model, mg=mg)
        params = model.init_params(jax.random.PRNGKey(3))
        opt_state = trainer.optimizer.init(params)
        params, _, parts = trainer._epoch_fn(params, opt_state,
                                             jax.random.PRNGKey(4))
        results[mg] = jax.tree.map(np.asarray, params)
        assert np.isfinite(np.asarray(parts)).all()

    # MG must actually change the trajectory
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree.leaves(results[False]), jax.tree.leaves(results[True]))]
    assert max(diffs) > 0


def test_mg_config_loading():
    """mg.yaml merges alpha1/alpha2/beta into hyper_parameters
    (reference configurator.py:64-86 + configs/mg.yaml)."""
    from foodrec_tpu.config import Config

    cfg = Config(model="LightGCN", dataset="X", config_dict={}, mg=True)
    assert cfg["alpha1"] is not None
    assert cfg["alpha2"] is not None
    assert cfg["beta"] is not None
    for k in ("alpha1", "alpha2", "beta"):
        assert k in cfg["hyper_parameters"]

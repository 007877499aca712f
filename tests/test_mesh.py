"""Mesh scale-out (SURVEY.md §5.8): data-parallel epoch on the virtual
8-device mesh matches single-device results; 'model'-axis sharding rules
pick the large modality tables."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import make_config


def _setup(synth_root, overrides=None):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, _ = make_config(synth_root, model="LightGCN", overrides={
        "epochs": 2, "train_batch_size": 16, "seed": 999,
        **(overrides or {})})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("LightGCN")(cfg, data)
    return Trainer(cfg, model), model


def test_data_parallel_epoch_matches_single_device(synth_root):
    results = []
    for mesh_shape in (None, {"data": 8}):
        trainer, model = _setup(synth_root, {"mesh_shape": mesh_shape})
        params = model.init_params(jax.random.PRNGKey(5))
        opt_state = trainer.optimizer.init(params)
        params, _, parts = trainer._epoch_fn(params, opt_state,
                                             jax.random.PRNGKey(6))
        results.append((jax.tree.map(np.asarray, params), np.asarray(parts)))
    (p0, l0), (p1, l1) = results
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_param_sharding_rules(synth_root):
    from jax.sharding import PartitionSpec as P

    from foodrec_tpu.parallel.mesh import make_mesh

    trainer, model = _setup(synth_root)
    mesh = make_mesh({"data": 4, "model": 2})
    # fake a big modality table so the rule triggers
    params = model.init_params(jax.random.PRNGKey(0))
    params["image_embedding"] = jnp.zeros((60, 512))
    sh = model.param_shardings(mesh, params)
    assert sh["image_embedding"].spec == P("model", None)
    assert sh["user_embedding"].spec == P()

"""The chunked epoch scan (epoch_scan_chunk) must be bit-identical to the
single whole-epoch scan — overflow steps of the ragged final chunk are no-ops
and the per-step PRNG derivation is position-based (fold_in)."""

import jax
import numpy as np

from tests.conftest import make_config


def _trainer(synth_root, chunk):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, _ = make_config(synth_root, model="LightGCN", overrides={
        "epochs": 2, "train_batch_size": 16, "seed": 999,
        "epoch_scan_chunk": chunk})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("LightGCN")(cfg, data)
    return Trainer(cfg, model), model


def test_chunked_epoch_matches_whole_epoch(synth_root):
    outs = []
    for chunk in (0, 3):  # whole epoch vs ragged 3-step chunks
        trainer, model = _trainer(synth_root, chunk)
        params = model.init_params(jax.random.PRNGKey(7))
        opt_state = trainer.optimizer.init(params)
        params, opt_state, parts = trainer._epoch_fn(
            params, opt_state, jax.random.PRNGKey(11))
        outs.append((jax.tree.map(np.asarray, params), np.asarray(parts)))

    (p0, l0), (p1, l1) = outs
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

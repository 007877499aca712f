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


def test_final_batch_runs_at_exact_size(synth_root):
    """Reference DataLoader semantics: the epoch's last batch is SMALLER
    (n_train % bs), not cyclically padded — padding is exact for
    weight-masked per-sample losses but biases batch-statistics losses
    (PRICAI's dCor). The probe model returns each batch's width as its
    'loss', so the epoch total equals the sum of actual batch sizes."""
    import jax.numpy as jnp

    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model
    from foodrec_tpu.models.lightgcn import LightGCN

    class SizeProbe(LightGCN):
        def calculate_loss(self, params, batch):
            return (jnp.float32(batch["u_id"].shape[0]),)

    cfg, _ = make_config(synth_root, model="LightGCN", overrides={
        "epochs": 1, "train_batch_size": 16, "seed": 999})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    n_train = int(data.device_data.n_train)
    for bs in (17, 19, 23):  # a batch size with a genuine remainder
        if n_train % bs:
            break
    # fail loudly if every candidate divides n_train — otherwise the test
    # would silently exercise no exact-size tail at all
    assert n_train % bs != 0, f"no remainder for any bs candidate ({n_train})"
    cfg.final_config_dict["train_batch_size"] = bs
    model = SizeProbe(cfg, data)
    trainer = Trainer(cfg, model)
    params = model.init_params(jax.random.PRNGKey(7))
    opt_state = trainer.optimizer.init(params)
    _, _, parts = trainer._epoch_fn(params, opt_state, jax.random.PRNGKey(3))
    assert int(np.asarray(parts)[0]) == n_train

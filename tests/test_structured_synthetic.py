"""With latent structure planted in the synthetic data, training must beat
random on HELD-OUT items — the end-to-end learning check random data can't
provide."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def structured_root(tmp_path_factory):
    from foodrec_tpu.data import synthetic

    root = tmp_path_factory.mktemp("structured") / "Synth"
    meta = synthetic.generate(
        str(root), n_users=150, n_items=300, neg_num=50, latent_dim=8,
        train_per_user=(8, 15), test_per_user=(2, 4), seed=11)
    return str(root), meta


def test_lightgcn_learns_heldout_signal(structured_root):
    from tests.conftest import make_config

    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, meta = make_config(structured_root, model="LightGCN", overrides={
        "epochs": 40, "eval_step": 40, "stopping_step": 50,
        "train_batch_size": 64, "seed": 999, "learning_rate": 0.01})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("LightGCN")(cfg, data)
    trainer = Trainer(cfg, model)
    _, _, test_res = trainer.fit(data, saved=False, hyper_tuple=(999,))
    assert test_res["AUC"] > 0.6, test_res
    assert test_res["NDCG@20"] > 0.1, test_res

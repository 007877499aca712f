"""Cold/sense/health-level study evals (SURVEY.md §2.3 feeders /
§7 step 7) over the synthetic study splits."""

import jax
import numpy as np
import pytest

from tests.conftest import make_config


@pytest.fixture(scope="module")
def study_setup(tmp_path_factory):
    from foodrec_tpu.data import synthetic
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    root = tmp_path_factory.mktemp("study_ds") / "Synth"
    meta = synthetic.generate(str(root))
    cfg, _ = make_config((str(root), meta), model="LightGCN", overrides={
        "cold_study": True, "sense_study": True, "health_level_study": True,
        "epochs": 2, "eval_step": 2, "train_batch_size": 16, "seed": 999,
    })
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("LightGCN")(cfg, data)
    trainer = Trainer(cfg, model)
    params = model.init_params(jax.random.PRNGKey(0))
    return trainer, params, data


def _check_metrics(m):
    assert set(m) == {"AUC", "Recall@10", "Recall@20", "NDCG@10", "NDCG@20"}
    for v in m.values():
        assert 0.0 <= v <= 1.0


def test_cold_start_study(study_setup):
    trainer, params, data = study_setup
    out = trainer.cold_start_study(params)
    _check_metrics(out["cold"])
    _check_metrics(out["warm"])
    assert len(out["cold_predictions"]) == len(data.cold_users)


def test_sense_study(study_setup):
    trainer, params, data = study_setup
    out = trainer.sense_study(params)
    _check_metrics(out["sense"])
    _check_metrics(out["unsense"])


def test_health_level_study(study_setup):
    trainer, params, data = study_setup
    out = trainer.health_level_study(params)
    assert len(out) >= 1
    for m in out.values():
        _check_metrics(m)


def test_plot_train_loss(study_setup, tmp_path):
    trainer, params, data = study_setup
    trainer.train_loss_dict = {0: 2.0, 1: 1.5}
    path = tmp_path / "loss.png"
    trainer.plot_train_loss(path=str(path))
    assert path.exists()

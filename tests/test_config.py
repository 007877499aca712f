"""Config merge semantics (reference parity: FoodRec/utils/configurator.py)."""

from foodrec_tpu.config import Config, hyper_combinations


def test_merge_priority_dict_over_files():
    cfg = Config(model="LightGCN", dataset="Foodcom",
                 config_dict={"learning_rate": 0.42})
    assert cfg["learning_rate"] == 0.42  # dict beats model yaml (0.001)


def test_model_yaml_overrides_overall():
    cfg = Config(model="LightGCN", dataset="Foodcom")
    assert cfg["train_batch_size"] == 512  # model yaml beats overall (1024)
    assert cfg["epochs"] == 100


def test_missing_key_is_none():
    cfg = Config(model="LightGCN", dataset="Foodcom")
    assert cfg["nonexistent_flag_xyz"] is None
    assert not cfg["use_health_level_multi_hot"]  # only set in CIKM yaml


def test_float_resolver():
    cfg = Config(model="LightGCN", dataset="Foodcom")
    assert isinstance(cfg["reg_weight"], float)
    assert abs(cfg["reg_weight"] - 0.1) < 1e-12


def test_seed_always_in_hyper_parameters():
    cfg = Config(model="BM3", dataset="Foodcom")
    assert "seed" in cfg["hyper_parameters"]


def test_hyper_parameters_concat_and_grid():
    cfg = Config(model="LightGCN", dataset="Foodcom")
    # overall contributes ["seed"], LightGCN yaml contributes ["flagD"]
    assert set(cfg["hyper_parameters"]) >= {"seed", "flagD"}
    names, combos = hyper_combinations(cfg)
    assert len(combos) == len(cfg["seed"] or [None]) * len(cfg["flagD"])


def test_mg_yaml_merge():
    cfg = Config(model="LightGCN", dataset="Foodcom", mg=True)
    assert cfg["alpha1"] == [1.0]
    assert cfg["beta"] == [3]
    assert "alpha2" in cfg["hyper_parameters"]


def test_valid_metric_bigger():
    cfg = Config(model="LightGCN", dataset="Foodcom")
    assert cfg["valid_metric_bigger"] is True

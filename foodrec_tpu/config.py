# coding: utf-8
"""Layered yaml configuration.

Reproduces the reference semantics (FoodRec/utils/configurator.py:11-139):

  * merge order: overall.yaml -> dataset/{dataset}.yaml (optional) ->
    model/{model}.yaml -> mg.yaml (if mg) -> runtime dict (highest priority)
  * `hyper_parameters` lists from every file are concatenated, and 'seed' is
    force-included (configurator.py:106-108)
  * a custom yaml float resolver so `1e-4` parses as float
    (configurator.py:88-100)
  * missing keys read as None (configurator.py:121-125) — feature flags that
    are only set in some model yamls default to falsy None everywhere else
  * `valid_metric_bigger` derived from the metric name (configurator.py:102-105)

Device selection is JAX-native: config['device'] holds the jax platform name
instead of a torch.device (reference picks CUDA_VISIBLE_DEVICES,
configurator.py:110-114).
"""

import os
import re

import yaml

_DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")

_SMALLER_METRICS = ("rmse", "mae", "logloss")


def _yaml_loader():
    """yaml loader whose float resolver accepts scientific notation like 1e-4.

    The default yaml 1.1 resolver parses `1e-4` as a string; the reference
    installs an extended regex (configurator.py:88-100) and we need identical
    parses for hyperparameter files.
    """
    loader = yaml.FullLoader
    loader.add_implicit_resolver(
        "tag:yaml.org,2002:float",
        re.compile(
            r"""^(?:
             [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
            |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
            |\.[0-9_]+(?:[eE][-+][0-9]+)?
            |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
            |[-+]?\.(?:inf|Inf|INF)
            |\.(?:nan|NaN|NAN))$""",
            re.X,
        ),
        list("-+0123456789."),
    )
    return loader


class Config:
    """Dict-like layered config; missing keys return None."""

    def __init__(self, model=None, dataset=None, config_dict=None, mg=False,
                 config_dir=None):
        if config_dict is None:
            config_dict = {}
        config_dict = dict(config_dict)
        config_dict["model"] = model
        config_dict["dataset"] = dataset
        self.config_dir = config_dir or _DEFAULT_CONFIG_DIR

        self.final_config_dict = self._load_file_configs(config_dict, mg)
        # runtime dict has the highest priority (configurator.py:58-60)
        self.final_config_dict.update(config_dict)
        self._set_default_parameters()
        self._init_device()

    def _load_file_configs(self, config_dict, mg):
        merged = {}
        files = [
            os.path.join(self.config_dir, "overall.yaml"),
            os.path.join(self.config_dir, "dataset", f"{config_dict['dataset']}.yaml"),
            os.path.join(self.config_dir, "model", f"{config_dict['model']}.yaml"),
        ]
        if mg:
            files.append(os.path.join(self.config_dir, "mg.yaml"))

        hyper_parameters = []
        loader = _yaml_loader()
        for path in files:
            if not os.path.isfile(path):
                continue
            with open(path, "r", encoding="utf-8") as f:
                data = yaml.load(f.read(), Loader=loader)
            if not data:
                continue
            if data.get("hyper_parameters"):
                hyper_parameters.extend(data["hyper_parameters"])
            merged.update(data)
        merged["hyper_parameters"] = hyper_parameters
        return merged

    def _set_default_parameters(self):
        valid_metric = self.final_config_dict["valid_metric"].split("@")[0]
        self.final_config_dict["valid_metric_bigger"] = (
            valid_metric.lower() not in _SMALLER_METRICS
        )
        if "seed" not in self.final_config_dict["hyper_parameters"]:
            self.final_config_dict["hyper_parameters"] += ["seed"]

    def _init_device(self):
        # JAX platform rather than a torch.device. Actual placement is driven
        # by jit/shardings; this records the user intent for logging.
        import jax

        use_accel = self.final_config_dict.get("use_gpu", True)
        platform = jax.default_backend()
        if not use_accel:
            platform = "cpu"
        self.final_config_dict["device"] = platform

    # -- dict-style access ---------------------------------------------------
    def __setitem__(self, key, value):
        if not isinstance(key, str):
            raise TypeError("index must be a str.")
        self.final_config_dict[key] = value

    def __getitem__(self, item):
        # Missing keys read as None — the mechanism by which the reference's
        # ~15 optional flags default off (configurator.py:121-125).
        return self.final_config_dict.get(item)

    def __contains__(self, key):
        if not isinstance(key, str):
            raise TypeError("index must be a str.")
        return key in self.final_config_dict

    def __str__(self):
        body = "\n".join(
            f"{k}={v}" for k, v in self.final_config_dict.items()
        )
        return "\n" + body + "\n\n"

    def __repr__(self):
        return self.__str__()


def hyper_combinations(config):
    """Expand config['hyper_parameters'] into the grid-search cartesian product.

    Mirrors FoodRec/utils/quick_start.py:54-60: each hyper_parameters entry
    names a config key whose value is a list of candidates; keys whose value is
    falsy expand to [None].
    """
    from itertools import product

    names = list(config["hyper_parameters"])
    if "seed" not in names:
        names = ["seed"] + names
    grids = []
    for name in names:
        val = config[name]
        if not val:
            grids.append([None])
        elif isinstance(val, (list, tuple)):
            grids.append(list(val))
        else:
            grids.append([val])
    return names, list(product(*grids))

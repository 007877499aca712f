# coding: utf-8
"""Model zoo registry.

The reference resolves models by importlib relative to cwd
(FoodRec/utils/utils.py:27-40); here it is an explicit dict (SURVEY.md §7
design stance) keyed by the same config `model` strings.
"""

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_model(name):
    # import lazily so `foodrec_tpu.models` stays cheap to import
    import importlib

    if name not in _REGISTRY:
        importlib.import_module(f"foodrec_tpu.models.{name.lower()}")
    if name not in _REGISTRY:
        raise ValueError(f"unknown model: {name}")
    return _REGISTRY[name]

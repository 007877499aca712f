# coding: utf-8
"""Cross-cutting utilities (reference: FoodRec/utils/utils.py).

The importlib-by-cwd model registry is replaced by an explicit dict in
foodrec_tpu.models (see SURVEY.md §7 design stance).
"""

import datetime
import random

import numpy as np


def enable_compilation_cache(path=None):
    """Persistent XLA compilation cache — first compiles through the TPU
    tunnel are slow (minutes at Foodcom scale); cache them across runs.
    Default location lives in the repo so every entry point (runner, bench,
    driver) shares one cache."""
    import os

    import jax

    if path is None:
        path = os.environ.get("FOODREC_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without these flags
        pass


def get_local_time():
    return datetime.datetime.now().strftime("%b-%d-%Y-%H-%M-%S")


def init_seed(seed):
    """Seed host-side RNGs. Device randomness is threaded explicitly through
    jax.random keys derived from this seed (reference: utils.py:47-53 seeds
    torch/numpy/random globally)."""
    random.seed(seed)
    np.random.seed(seed)


def early_stopping(value, best, cur_step, max_step, bigger=True):
    """Validation-based early stopping with identical semantics to
    FoodRec/utils/utils.py:56-97.

    Returns (best, cur_step, stop_flag, update_flag).
    """
    stop_flag = False
    update_flag = False
    better = value > best if bigger else value < best
    if better:
        cur_step = 0
        best = value
        update_flag = True
    else:
        cur_step += 1
        if cur_step > max_step:
            stop_flag = True
    return best, cur_step, stop_flag, update_flag


def dict2str(result_dict):
    """Format a metric dict the way the reference logs it (utils.py:100-113)."""
    return "".join(
        f"{metric}: {value:.04f}    " for metric, value in result_dict.items()
    )

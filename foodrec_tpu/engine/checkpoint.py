# coding: utf-8
"""Checkpointing (SURVEY.md §5.4).

The reference only torch.save()s the best-on-valid state_dict and reloads it
for the final test (FoodRec/common/trainer.py:390-396, 449-450, 463);
`start_epoch` exists but is always 0 — no mid-training resume. Here:

  * best-on-valid params snapshot with the same semantics (`save_best`)
  * full training-state checkpoints (params + optimizer state + epoch +
    PRNG key + early-stopping counters) for step resume (`save_state` /
    `load_state`), orbax-backed with a pickle fallback
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def _to_device(tree):
    return jax.tree.map(jnp.asarray, tree)


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_best(params, path):
    """Best-on-valid params only (reference torch.save parity)."""
    with open(path, "wb") as f:
        pickle.dump(_to_host(params), f)


def load_best(path):
    with open(path, "rb") as f:
        return _to_device(pickle.load(f))


def save_state(path, params, opt_state, epoch, key, best_valid_score,
               cur_step, train_loss_dict):
    """Full resumable training state."""
    state = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state),
        "epoch": int(epoch),
        "key": np.asarray(key),
        "best_valid_score": float(best_valid_score),
        "cur_step": int(cur_step),
        "train_loss_dict": dict(train_loss_dict),
    }
    ocp = _orbax()
    if ocp is not None:
        try:
            path_abs = os.path.abspath(path)
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(path_abs, state, force=True)
            return
        except Exception:
            # e.g. tensorstore rejects exotic characters in the path —
            # fall through to the pickle format
            pass
    with open(path + ".pkl", "wb") as f:
        pickle.dump(state, f)


def load_state(path, opt_state_template=None):
    """Returns the dict saved by save_state with arrays on device.

    `opt_state_template`: when given, the restored flat opt_state leaves are
    re-threaded onto the template treedef (orbax round-trips namedtuples as
    plain containers)."""
    ocp = _orbax()
    state = None
    if ocp is not None and os.path.isdir(os.path.abspath(path)):
        try:
            with ocp.PyTreeCheckpointer() as ckptr:
                state = ckptr.restore(os.path.abspath(path))
        except Exception:
            state = None
    if state is None:
        with open(path + ".pkl", "rb") as f:
            state = pickle.load(f)
    state["params"] = _to_device(state["params"])
    opt = _to_device(state["opt_state"])
    if opt_state_template is not None:
        leaves = jax.tree.leaves(opt)
        treedef = jax.tree.structure(opt_state_template)
        opt = jax.tree.unflatten(treedef, leaves)
    state["opt_state"] = opt
    state["key"] = jnp.asarray(state["key"])
    state["train_loss_dict"] = {int(k): float(v) for k, v in
                                state["train_loss_dict"].items()}
    return state

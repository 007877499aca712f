"""Checkpoint / resume (SURVEY.md §5.4): best-on-valid snapshot parity and
mid-training state resume produce the same trajectory as uninterrupted
training."""

import jax
import numpy as np

from tests.conftest import make_config


def _setup(synth_root, overrides=None):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, _ = make_config(synth_root, model="LightGCN", overrides={
        "epochs": 4, "eval_step": 2, "train_batch_size": 16,
        "stopping_step": 10, "seed": 999, **(overrides or {})})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("LightGCN")(cfg, data)
    return cfg, data, model, Trainer(cfg, model)


def test_best_checkpoint_roundtrip(synth_root, tmp_path):
    from foodrec_tpu.engine import checkpoint as ckpt

    cfg, data, model, trainer = _setup(synth_root)
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "best.pkl")
    ckpt.save_best(params, path)
    restored = ckpt.load_best(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_resume_matches_uninterrupted(synth_root, tmp_path):
    from foodrec_tpu.engine import checkpoint as ckpt

    cfg, data, model, trainer = _setup(synth_root)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = trainer.optimizer.init(params)

    # uninterrupted: 4 epochs with position-derived keys
    key = jax.random.PRNGKey(42)
    p_full, s_full = params, opt_state
    keys = jax.random.split(key, 4)
    for e in range(4):
        p_full, s_full, _ = trainer._epoch_fn(p_full, s_full, keys[e])

    # interrupted at epoch 2: save, reload, continue. Re-init: the first
    # branch donated the original params/opt_state buffers into its epoch.
    p = model.init_params(jax.random.PRNGKey(0))
    s = trainer.optimizer.init(p)
    for e in range(2):
        p, s, _ = trainer._epoch_fn(p, s, keys[e])
    path = str(tmp_path / "state")
    ckpt.save_state(path, p, s, epoch=1, key=keys[1], best_valid_score=0.1,
                    cur_step=0, train_loss_dict={0: 1.0, 1: 0.9})
    state = ckpt.load_state(path, opt_state_template=s)
    p2, s2 = state["params"], state["opt_state"]
    assert state["epoch"] == 1
    assert state["best_valid_score"] == 0.1
    assert state["train_loss_dict"] == {0: 1.0, 1: 0.9}
    for e in range(2, 4):
        p2, s2, _ = trainer._epoch_fn(p2, s2, keys[e])

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fit_resume_from(synth_root, tmp_path):
    cfg, data, model, trainer = _setup(synth_root, {
        "save_state_every": 2, "ckp_root": str(tmp_path) + "/"})
    trainer.fit(data, saved=False, hyper_tuple=(999,))
    states = [p for p in tmp_path.iterdir() if p.name.endswith(".state")
              or p.name.endswith(".state.pkl")]
    assert states, list(tmp_path.iterdir())

    # resume into a fresh trainer for 2 more epochs
    resume_path = str(states[0]).removesuffix(".pkl")
    cfg2, data2, model2, trainer2 = _setup(synth_root, {
        "epochs": 6, "resume_from": resume_path,
        "ckp_root": str(tmp_path) + "/"})
    best, valid, test = trainer2.fit(data2, saved=False, hyper_tuple=(999,))
    assert np.isfinite(list(test.values())).all()
    # epochs 0..3 were restored/skipped; only 4,5 trained
    assert set(trainer2.train_loss_dict) >= {4, 5}

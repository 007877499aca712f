"""Row-sparse Adam fast path (engine/sparse_adam.py): bit-exact with the
dense optax update it replaces.

The CIKM modality tables are dense trainable params in the reference
(from_pretrained(freeze=False), cikm_model.py:83-88) whose per-step
gradient is nonzero only at the gathered batch rows. The fast path skips
the dense zero-filled gradient; these tests pin that it changes NOTHING
numerically — unit-level vs a hand-run optax chain on scattered dense
grads, and end-to-end vs the dense trainer path over full epochs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.conftest import make_config


def _dense_chain(lr_schedule):
    return optax.chain(optax.scale_by_adam(eps=1e-8),
                       optax.scale_by_learning_rate(lr_schedule))


def test_unit_matches_optax_dense_bitwise():
    from foodrec_tpu.engine.sparse_adam import row_sparse_adam_update

    rng = np.random.default_rng(0)
    n, d, k = 64, 16, 24
    table = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    # duplicates on purpose: rows 3 and 7 appear multiple times
    rows = jnp.asarray(
        np.concatenate([[3, 7, 3, 7, 3], rng.integers(0, n, k - 5)]))
    g_rows = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)

    def lr_schedule(step):
        return 0.01 * 0.5 ** (step / 50)

    opt = _dense_chain(lr_schedule)
    state = opt.init({"t": table})
    params = {"t": table}
    mu = state[0].mu["t"]
    nu = state[0].nu["t"]
    count = state[0].count
    sched_count = state[1].count

    for step in range(3):
        # dense reference: scatter-add the row grads like XLA's gather
        # transpose does, then run the real optax chain
        g_dense = jnp.zeros((n, d), jnp.float32).at[rows].add(g_rows)
        updates, state = opt.update({"t": g_dense}, state, params)
        params = optax.apply_updates(params, updates)

        t2, mu, nu = row_sparse_adam_update(
            table, mu, nu, rows, g_rows, count=count,
            sched_count=sched_count, lr_schedule=lr_schedule)
        count = optax.safe_increment(count)
        sched_count = optax.safe_increment(sched_count)
        table = t2

        assert np.array_equal(np.asarray(params["t"]), np.asarray(table)), \
            f"param mismatch at step {step}"
        assert np.array_equal(np.asarray(state[0].mu["t"]), np.asarray(mu))
        assert np.array_equal(np.asarray(state[0].nu["t"]), np.asarray(nu))
        # fresh grads for the next step
        g_rows = g_rows * 0.7 + 0.1


def _run_epochs(synth_root, row_sparse, n_epochs=2, overrides=None):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, _ = make_config(synth_root, model="CIKM_Model", overrides={
        "epochs": n_epochs, "train_batch_size": 16, "seed": 999,
        "row_sparse_table_update": row_sparse, **(overrides or {})})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)
    params = model.init_params(jax.random.PRNGKey(5))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(6)
    parts = None
    for e in range(n_epochs):
        key, k = jax.random.split(key)
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
    return (jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, opt_state), np.asarray(parts))


def test_cikm_epoch_bitwise_equal_dense_vs_row_sparse(synth_root):
    """Two full CIKM epochs (adam, exact tail batch included): every
    parameter AND optimizer-state leaf identical bit for bit between the
    dense path and the row-sparse fast path."""
    p_dense, s_dense, l_dense = _run_epochs(synth_root, row_sparse=False)
    p_rs, s_rs, l_rs = _run_epochs(synth_root, row_sparse=True)

    assert np.array_equal(l_dense, l_rs)
    flat_d, tree_d = jax.tree.flatten_with_path(p_dense)
    flat_r, _ = jax.tree.flatten_with_path(p_rs)
    for (path, a), (_, b) in zip(flat_d, flat_r):
        assert np.array_equal(a, b), f"param leaf {path} differs"
    for (path, a), (_, b) in zip(jax.tree.flatten_with_path(s_dense)[0],
                                 jax.tree.flatten_with_path(s_rs)[0]):
        assert np.array_equal(a, b), f"opt-state leaf {path} differs"


def test_cikm_mesh_row_sparse_matches_dense(synth_root):
    """Data-parallel mesh: the row-sparse path's gathered-row gradients
    ride sharded batch rows (different reduction order than the dense
    psum), so the comparison is allclose, not bitwise."""
    p_dense, _, l_dense = _run_epochs(
        synth_root, row_sparse=False, n_epochs=1,
        overrides={"mesh_shape": {"data": 8}})
    p_rs, _, l_rs = _run_epochs(
        synth_root, row_sparse=True, n_epochs=1,
        overrides={"mesh_shape": {"data": 8}})
    np.testing.assert_allclose(l_dense, l_rs, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_dense), jax.tree.leaves(p_rs)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fallback_guards(synth_root):
    """MG / clipping / probe / non-adam learners keep the dense path: the
    epoch still runs and the row-sparse branch is provably off (the MG +
    probe paths read dense table grads, which would crash or mis-shape
    with gathered rows)."""
    for ov in ({"learner": "sgd"},
               {"clip_grad_norm": {"max_norm": 1.0}},
               {"calcu_cos_similarity": True}):
        p, s, parts = _run_epochs(synth_root, row_sparse=True, n_epochs=1,
                                  overrides=ov)
        assert np.isfinite(parts).all(), ov


def test_auto_size_heuristic(synth_root):
    """'auto' (null) must leave small tables on the dense path (the fast
    path only wins when n_rows >> batch rows — PARITY.md round-3 floor
    section) while True forces it. Both produce identical results; this
    pins the *decision*, via the trainer's rs_filter closure behavior:
    with auto and a small synth table the rows_map filters to empty."""
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, _ = make_config(synth_root, model="CIKM_Model", overrides={
        "epochs": 1, "train_batch_size": 16, "seed": 999,
        "row_sparse_table_update": None})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)

    import jax.numpy as jnp
    batch = {"pos_i_id": jnp.zeros((16,), jnp.int32),
             "neg_i_id": jnp.ones((16,), jnp.int32)}
    rows_map = model.row_sparse_tables(batch)
    assert set(rows_map) == {"image_embedding", "text_embedding"}
    params = model.init_params(jax.random.PRNGKey(0))
    # synth table is far smaller than 64x the 32 batch rows -> auto drops it
    kept = {n for n, r in rows_map.items()
            if params[n].shape[0] > 64 * r.shape[0]}
    assert kept == set()
    # an XL-shaped table would be kept by the same rule
    assert 299430 > 64 * 1024


def test_dedup_rows_order_matches_scatter():
    """dedup_rows' per-row duplicate accumulation must associate like
    XLA's in-order scatter-add (the dense backward)."""
    from foodrec_tpu.engine.sparse_adam import dedup_rows

    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.integers(0, 7, 40))
    g = jnp.asarray(rng.normal(size=(40, 5)).astype(np.float32) * 1e3)
    u, g_u, valid = dedup_rows(rows, g)
    dense = jnp.zeros((7, 5), jnp.float32).at[rows].add(g)
    got = np.zeros((7, 5), np.float32)
    got[np.asarray(u)[np.asarray(valid)]] = np.asarray(g_u)[np.asarray(valid)]
    assert np.array_equal(got, np.asarray(dense))

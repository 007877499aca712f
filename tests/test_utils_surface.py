"""Public util surface: LATTICE kNN-graph helpers vs dense numpy oracles
(reference utils.py:116-191), MLPLayers, diagnostics, stratified negatives."""

import jax
import jax.numpy as jnp
import numpy as np


def test_build_sim_and_knn():
    from foodrec_tpu.utils.graph_utils import (
        build_knn_neighbourhood, build_sim, compute_normalized_laplacian)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 6)).astype(np.float32)
    sim = np.asarray(build_sim(jnp.asarray(x)))
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(sim, xn @ xn.T, rtol=1e-5, atol=1e-6)

    kept = np.asarray(build_knn_neighbourhood(jnp.asarray(sim), 3))
    assert ((kept != 0).sum(axis=1) <= 3).all()
    # kept entries are each row's top-3 values
    for r in range(12):
        top3 = np.sort(sim[r])[-3:]
        nz = np.sort(kept[r][kept[r] != 0])
        np.testing.assert_allclose(nz, top3[-len(nz):], rtol=1e-6)

    lap = np.asarray(compute_normalized_laplacian(jnp.abs(jnp.asarray(sim))))
    a = np.abs(sim)
    d = a.sum(-1) ** -0.5
    np.testing.assert_allclose(lap, a * d[:, None] * d[None, :], rtol=1e-5)


def test_sparse_laplacian_normalizations():
    from foodrec_tpu.utils.graph_utils import get_sparse_laplacian

    edge_index = jnp.asarray([[0, 0, 1, 2], [1, 2, 0, 1]])
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    _, sym = get_sparse_laplacian(edge_index, w, 3, "sym")
    deg = np.array([3.0, 3.0, 4.0])
    expect = np.array([1, 2, 3, 4]) * (deg[[0, 0, 1, 2]] ** -0.5) * (
        deg[[1, 2, 0, 1]] ** -0.5)
    np.testing.assert_allclose(np.asarray(sym), expect, rtol=1e-5)

    _, rw = get_sparse_laplacian(edge_index, w, 3, "rw")
    np.testing.assert_allclose(np.asarray(rw),
                               np.array([1, 2, 3, 4]) / deg[[0, 0, 1, 2]],
                               rtol=1e-5)


def test_mlp_layers():
    from foodrec_tpu.common.module import mlp_layers_apply, mlp_layers_params

    params = mlp_layers_params(jax.random.PRNGKey(0), [8, 6, 4],
                               init_method="norm")
    x = jnp.ones((5, 8))
    y = mlp_layers_apply(params, x)
    assert y.shape == (5, 4)
    assert (np.asarray(y) >= 0).all()  # relu on last layer by default
    y2 = mlp_layers_apply(params, x, last_activation=False)
    assert y2.shape == (5, 4)


def test_embedding_cos_similarity():
    from foodrec_tpu.utils.diagnostics import embedding_cos_similarity

    rng = np.random.default_rng(1)
    e = [jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
         for _ in range(6)]
    out = embedding_cos_similarity(*e)
    assert len(out) == 6
    for v in out[:4]:
        assert -1.0 <= float(v) <= 1.0
    for v in out[4:]:
        assert 0.0 <= float(v) <= 1.0
    same = embedding_cos_similarity(e[0], e[0], e[0], e[0], e[0], e[0])
    assert float(same[0]) == 1.0 and float(same[4]) == 0.0


def test_health_stratified_negatives():
    from foodrec_tpu.data.sampling import sample_health_stratified_negatives

    num_users, num_items = 8, 64
    excl = jnp.zeros((num_users, 2), jnp.uint32)  # nothing excluded
    bucket_items = jnp.asarray([[10, 11, 12, -1], [20, 21, -1, -1]],
                               jnp.int32)
    # bucket is keyed by the POSITIVE item's health level
    # (dataloader.py:96-107): items 0/2/... level 0, items 1/3/... level 1
    health_level = jnp.asarray(np.arange(num_items) % 2, jnp.int32)
    in_set = jnp.asarray([True] * 4 + [False] * 4)
    users = jnp.arange(8, dtype=jnp.int32)
    pos_items = jnp.asarray([0, 1] * 4, jnp.int32)
    train_items = jnp.asarray([30, 31, 32, 33], jnp.int32)
    neg = sample_health_stratified_negatives(
        jax.random.PRNGKey(0), users, pos_items, excl, health_level,
        bucket_items, in_set, train_items)
    neg = np.asarray(neg)
    # users 0..3 are in the sample set: draws come from the pos item's bucket
    assert neg[0] in {10, 11, 12} and neg[2] in {10, 11, 12}
    assert neg[1] in {20, 21} and neg[3] in {20, 21}
    # users 4..7 fall back to uniform over the TRAIN item list
    # (reference: random.choice(train_item_list))
    assert set(neg[4:].tolist()) <= {30, 31, 32, 33}

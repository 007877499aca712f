"""Graph normalization + SpMM parity against scipy (SURVEY.md §4c)."""

import numpy as np
import pytest
import scipy.sparse as sp

from foodrec_tpu.ops.graph import (
    row_normalized_adjacency,
    sym_normalized_adjacency,
)
from foodrec_tpu.ops.spmm import Propagator, propagate_mean


def _reference_sym_norm(rows, cols, n):
    """The reference's normalization recipe (cikm_model.py:136-180)."""
    A = sp.dok_matrix((n, n), dtype=np.float32)
    for r, c in zip(rows, cols):
        A[r, c] = 1.0
        A[c, r] = 1.0
    deg = np.asarray((A > 0).sum(axis=1)).flatten() + 1e-7
    d = np.power(deg, -0.5)
    D = sp.diags(d)
    return sp.coo_matrix(D * A * D)


def _reference_row_norm(rows, cols, n):
    """FGCN's D^-1 A (fgcn.py:84-106)."""
    A = sp.dok_matrix((n, n), dtype=np.float32)
    for r, c in zip(rows, cols):
        A[r, c] = 1.0
        A[c, r] = 1.0
    A = A.tocoo()
    rowsum = np.array(A.sum(1)).flatten()
    with np.errstate(divide="ignore"):
        d_inv = np.power(rowsum, -1.0)
    d_inv[np.isinf(d_inv)] = 0.0
    return sp.coo_matrix(sp.diags(d_inv).dot(A))


@pytest.fixture(params=[17, 64])
def random_graph(request, rng):
    n = request.param
    nnz = 3 * n
    rows = rng.integers(0, n, size=nnz)
    cols = rng.integers(0, n, size=nnz)
    return rows, cols, n


def test_sym_norm_matches_reference(random_graph):
    rows, cols, n = random_graph
    adj = sym_normalized_adjacency(rows, cols, n)
    ref = _reference_sym_norm(rows, cols, n).todense()
    ours = sp.coo_matrix((adj.vals, (adj.rows, adj.cols)), shape=(n, n)).todense()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_row_norm_matches_reference(random_graph):
    rows, cols, n = random_graph
    adj = row_normalized_adjacency(rows, cols, n)
    ref = _reference_row_norm(rows, cols, n).todense()
    ours = sp.coo_matrix((adj.vals, (adj.rows, adj.cols)), shape=(n, n)).todense()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("impl", ["ell", "segment", "pallas"])
def test_spmm_impls_match_scipy(random_graph, rng, impl):
    rows, cols, n = random_graph
    adj = sym_normalized_adjacency(rows, cols, n)
    x = rng.normal(size=(n, 64)).astype(np.float32)
    dense = sp.coo_matrix((adj.vals, (adj.rows, adj.cols)), shape=(n, n)) @ x
    prop = Propagator(adj, impl=impl)
    got = np.asarray(prop(x))
    np.testing.assert_allclose(got, dense, rtol=1e-4, atol=1e-5)


def test_propagate_mean_matches_loop(random_graph, rng):
    rows, cols, n = random_graph
    adj = sym_normalized_adjacency(rows, cols, n)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    prop = Propagator(adj, impl="segment")
    got = np.asarray(propagate_mean(prop, x, 3))
    A = sp.coo_matrix((adj.vals, (adj.rows, adj.cols)), shape=(n, n))
    acc, cur = x.copy(), x.copy()
    for _ in range(3):
        cur = A @ cur
        acc += cur
    np.testing.assert_allclose(got, acc / 4, rtol=1e-4, atol=1e-5)


def test_power_law_graph_skips_ell(rng):
    # one hub node with degree > cap must disable the padded table
    n = 300
    rows = np.zeros(200, dtype=np.int64)
    cols = rng.choice(np.arange(1, n), size=200, replace=False)
    adj = sym_normalized_adjacency(rows, cols, n)
    assert not adj.has_ell
    x = rng.normal(size=(n, 16)).astype(np.float32)
    dense = sp.coo_matrix((adj.vals, (adj.rows, adj.cols)), shape=(n, n)) @ x
    got = np.asarray(Propagator(adj, impl="auto")(x))
    np.testing.assert_allclose(got, dense, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["ell", "segment", "pallas"])
def test_custom_vjp_matches_dense_grad(random_graph, rng, impl):
    """d/dx (A @ x) must equal A^T @ g (custom VJP vs dense oracle)."""
    import jax
    import jax.numpy as jnp

    rows, cols, n = random_graph
    adj = sym_normalized_adjacency(rows, cols, n)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    w = rng.normal(size=(n, 32)).astype(np.float32)
    prop = Propagator(adj, impl=impl)

    g = jax.grad(lambda x: jnp.sum(prop(x) * w))(jnp.asarray(x))
    A = sp.coo_matrix((adj.vals, (adj.rows, adj.cols)), shape=(n, n)).toarray()
    np.testing.assert_allclose(np.asarray(g), A.T @ w, rtol=1e-4, atol=1e-5)


def test_custom_vjp_nonsymmetric(rng):
    """Row-normalized (non-symmetric) adjacency uses a true transpose."""
    import jax
    import jax.numpy as jnp

    from foodrec_tpu.ops.graph import row_normalized_adjacency

    n = 40
    rows = rng.integers(0, n, size=100)
    cols = rng.integers(0, n, size=100)
    adj = row_normalized_adjacency(rows, cols, n)
    assert not adj.symmetric
    x = rng.normal(size=(n, 16)).astype(np.float32)
    w = rng.normal(size=(n, 16)).astype(np.float32)
    prop = Propagator(adj, impl="segment")
    g = jax.grad(lambda x: jnp.sum(prop(x) * w))(jnp.asarray(x))
    A = sp.coo_matrix((adj.vals, (adj.rows, adj.cols)), shape=(n, n)).toarray()
    np.testing.assert_allclose(np.asarray(g), A.T @ w, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["ell", "segment"])
def test_bf16_compute_dtype_close_to_f32(random_graph, rng, impl):
    rows, cols, n = random_graph
    adj = sym_normalized_adjacency(rows, cols, n)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    f32 = np.asarray(Propagator(adj, impl=impl)(x))
    bf16 = np.asarray(Propagator(adj, impl=impl,
                                 compute_dtype="bfloat16")(x))
    assert bf16.dtype == np.float32
    np.testing.assert_allclose(bf16, f32, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("eb,rp", [(16, 8), (64, 32), (8, 64)])
def test_pallas_block_geometry_parameterization(random_graph, rng, eb, rp):
    """The pallas kernel's edge-block / row-panel geometry is configurable
    (tools/spmm_microbench.py sweeps it); any geometry must give the same
    result as scipy."""
    import foodrec_tpu.ops.spmm as spmm_mod

    rows, cols, n = random_graph
    adj = sym_normalized_adjacency(rows, cols, n)
    x = rng.standard_normal((n, 12)).astype(np.float32)
    ref = _reference_sym_norm(rows, cols, n) @ x
    old = spmm_mod.EDGE_BLOCK, spmm_mod.ROW_PANEL
    try:
        spmm_mod.EDGE_BLOCK, spmm_mod.ROW_PANEL = eb, rp
        prop = Propagator(adj, impl="pallas")
        assert (prop.edge_block, prop.row_panel) == (eb, rp)
        out = np.asarray(prop(x))
    finally:
        spmm_mod.EDGE_BLOCK, spmm_mod.ROW_PANEL = old
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("precision", ["highest", "3pass", "default"])
def test_pallas_precision_strategies(random_graph, rng, precision):
    """All MXU emulation strategies must stay within their documented error
    envelopes ('default' = single bf16 pass is NOT parity-grade; the other
    two are)."""
    import foodrec_tpu.ops.spmm as spmm_mod

    rows, cols, n = random_graph
    adj = sym_normalized_adjacency(rows, cols, n)
    x = rng.standard_normal((n, 12)).astype(np.float32)
    ref = _reference_sym_norm(rows, cols, n) @ x
    old = spmm_mod.MXU_PRECISION
    try:
        spmm_mod.MXU_PRECISION = precision
        out = np.asarray(Propagator(adj, impl="pallas")(x))
    finally:
        spmm_mod.MXU_PRECISION = old
    scale = np.abs(ref).max() or 1.0
    err = np.abs(out - ref).max() / scale
    assert err < (2e-2 if precision == "default" else 1e-5), err

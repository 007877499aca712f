# coding: utf-8
"""Host-side graph preprocessing: one-time normalized-adjacency builds.

The reference builds scipy dok matrices and converts to torch sparse tensors
per model (canonical copy: FoodRec/models/cikm_model.py:136-180; FGCN's
row-normalized variant fgcn.py:84-106). Here the build is a single vectorized
numpy pass producing device-ready sorted-COO and padded-ELL arrays with static
shapes, which is what the TPU propagation kernels consume.

Normalization semantics preserved exactly:
  * symmetric: d = binary_degree + 1e-7 ; val(r,c) = d[r]^-1/2 * d[c]^-1/2
    over the deduplicated symmetrized edge set (cikm_model.py:166-172)
  * row: d_inv = 1/degree with inf -> 0 ; val(r,c) = d_inv[r] (fgcn.py:96-100)
"""

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class NormalizedAdjacency:
    """A normalized sparse adjacency over `n_nodes`, stored both as
    row-sorted COO (for segment-sum SpMM) and ELL (for gather SpMM)."""

    n_nodes: int
    # sorted-COO (row-major): static nnz
    rows: np.ndarray  # int32 [nnz]
    cols: np.ndarray  # int32 [nnz]
    vals: np.ndarray  # float32 [nnz]
    # ELL: one padded neighbour table; pad col = 0 with val = 0.
    # Only materialized for bounded-degree graphs (None otherwise — power-law
    # graphs would blow up HBM at [n_nodes, max_degree]).
    ell_cols: np.ndarray  # int32 [n_nodes, max_deg] or None
    ell_vals: np.ndarray  # float32 [n_nodes, max_deg] or None
    max_degree: int
    # True when A == A^T (symmetric normalization over a symmetrized edge
    # set) — lets the SpMM's custom VJP reuse the same tables backward
    symmetric: bool = False

    @property
    def nnz(self):
        return len(self.rows)

    @property
    def has_ell(self):
        return self.ell_cols is not None


def _dedup_symmetrize(rows, cols, n_nodes):
    """Unique undirected edge set as both directions (matches the dok-dict
    dedup in the reference adjacency builders)."""
    r = np.concatenate([rows, cols]).astype(np.int64)
    c = np.concatenate([cols, rows]).astype(np.int64)
    key = r * n_nodes + c
    key = np.unique(key)
    return (key // n_nodes).astype(np.int64), (key % n_nodes).astype(np.int64)


def _to_sorted_coo(rows, cols, vals):
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], vals[order]


def _to_ell(rows, cols, vals, n_nodes, max_degree=None):
    counts = np.bincount(rows, minlength=n_nodes)
    md = int(counts.max()) if max_degree is None else max_degree
    md = max(md, 1)
    ell_cols = np.zeros((n_nodes, md), dtype=np.int32)
    ell_vals = np.zeros((n_nodes, md), dtype=vals.dtype)
    # rows is sorted; slot index = position within its row run
    slot = np.arange(len(rows)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    ell_cols[rows, slot] = cols
    ell_vals[rows, slot] = vals
    return ell_cols, ell_vals, md


ELL_DEGREE_CAP = 96  # above this, the padded table wastes HBM on power-law rows


def _build(rows, cols, vals, n_nodes, symmetric=False, vals_dtype=np.float32):
    """vals_dtype matches each reference builder's own precision: f32 for the
    FloatTensor-cast scipy builds (cikm_model.py:131/178, lightgcn.py:118,
    fgcn.py:103), None (keep f64) for gcn_conv_adjacency — PyG's GCNConv
    normalizes at RUNTIME in the input dtype, so the f64 gradient
    certificate needs the unrounded values (device arrays still become f32
    in production via jnp.asarray without x64; single rounding either way)."""
    if vals_dtype is not None:
        vals = vals.astype(vals_dtype)
    rows, cols, vals = _to_sorted_coo(
        rows.astype(np.int64), cols.astype(np.int64), vals)
    md = int(np.bincount(rows, minlength=n_nodes).max()) if len(rows) else 1
    if md <= ELL_DEGREE_CAP:
        ell_cols, ell_vals, md = _to_ell(rows, cols, vals, n_nodes)
    else:
        ell_cols, ell_vals = None, None
    return NormalizedAdjacency(
        n_nodes=n_nodes,
        rows=rows.astype(np.int32), cols=cols.astype(np.int32),
        vals=vals,
        ell_cols=ell_cols, ell_vals=ell_vals, max_degree=md,
        symmetric=symmetric)


def transpose_adjacency(adj):
    """A^T as its own row-sorted/ELL NormalizedAdjacency (for the SpMM
    custom-VJP backward of non-symmetric adjacencies)."""
    if adj.symmetric:
        return adj
    # vals_dtype=None: vals already carry their final dtype — re-casting to
    # f32 here would round only the BACKWARD adjacency of an f64 graph
    # (caught by the gradient certificate: exact forward, 1e-8 backward)
    return _build(adj.cols, adj.rows, adj.vals, adj.n_nodes, vals_dtype=None)


def sym_normalized_adjacency(rows, cols, n_nodes, symmetrize=True):
    """D^-1/2 A D^-1/2 with +1e-7 on the binary degree
    (reference: cikm_model.py:136-180 and clones)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    if symmetrize:
        rows, cols = _dedup_symmetrize(rows, cols, n_nodes)
    deg = np.bincount(rows, minlength=n_nodes).astype(np.float64)
    d = np.power(deg + 1e-7, -0.5)
    vals = d[rows] * d[cols]
    # symmetrized edge set + symmetric values -> A == A^T
    return _build(rows, cols, vals, n_nodes, symmetric=symmetrize)


def row_normalized_adjacency(rows, cols, n_nodes, symmetrize=True):
    """D^-1 A over the deduplicated symmetrized edges (reference: fgcn.py:84-106)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    if symmetrize:
        rows, cols = _dedup_symmetrize(rows, cols, n_nodes)
    # f32 reciprocal to match the reference bit-for-bit: fgcn.py:85-100 sums
    # a float32 dok matrix and takes np.power(rowsum_f32, -1) in f32, which
    # double-rounds differently from f64-then-cast on ~1ulp of rows (found by
    # the f64 gradient certificate, tools/grad_certificate.py)
    deg = np.bincount(rows, minlength=n_nodes).astype(np.float32)
    with np.errstate(divide="ignore"):
        d_inv = np.power(deg, np.float32(-1.0))
    d_inv[np.isinf(d_inv)] = 0.0
    vals = d_inv[rows]
    return _build(rows, cols, vals, n_nodes)


def gcn_conv_adjacency(src, dst, n_nodes):
    """torch_geometric GCNConv gcn_norm parity over a *directed* edge list
    (used by SCHGN's hetero graph, schgn.py:29-41):

      A_hat = A + I;  deg[i] = in-degree(i) + 1 (self loop);
      val(s, d) = deg[s]^-1/2 * deg[d]^-1/2;  y[d] = sum val * x[s]

    Note PyG computes deg on the target column but indexes it at both edge
    ends, so isolated-source nodes use their own (self-loop-only) in-degree.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    loop = np.arange(n_nodes, dtype=np.int64)
    src = np.concatenate([src, loop])
    dst = np.concatenate([dst, loop])
    deg = np.bincount(dst, minlength=n_nodes).astype(np.float64)
    d_inv_sqrt = np.power(np.maximum(deg, 1e-12), -0.5)
    vals = d_inv_sqrt[src] * d_inv_sqrt[dst]
    # rows = dst so Propagator's y = A @ x aggregates incoming messages.
    # vals stay f64: GCNConv normalizes at runtime in the input dtype
    # (stub in parity_check.py mirrors that), so the f64 certificate needs
    # the unrounded values; production still lands f32 at jnp.asarray
    return _build(dst, src, vals, n_nodes, vals_dtype=None)


def bipartite_offset_edges(triples, offset_head=0, offset_tail=0):
    """Map (head, tail) triples into a joint node-id space.

    Models offset tail ids by block starts, e.g. item–ingredient edges become
    (ingre + n_items, item) pairs (cikm_model.py:91-106, schgn.py:139-151).
    Returns (rows, cols) of the directed tail->head edges before symmetrize.
    """
    triples = np.asarray(triples, dtype=np.int64)
    heads = triples[:, 0] + offset_head
    tails = triples[:, 1] + offset_tail
    return tails, heads


def ui_bipartite_edges(train_coo, n_users):
    """(user, item+n_users) directed edges from the train COO
    (cikm_model.py:149-165)."""
    rows = np.asarray(train_coo.row, dtype=np.int64)
    cols = np.asarray(train_coo.col, dtype=np.int64) + n_users
    return rows, cols

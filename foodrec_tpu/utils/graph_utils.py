# coding: utf-8
"""LATTICE-style kNN-graph utilities (reference: FoodRec/utils/utils.py:116-191).

Not called by the six shipped models but part of the reference's public util
surface. JAX-native: `jax.ops.segment_sum` replaces torch_scatter.scatter_add,
`jax.lax.top_k` replaces torch.topk, one-hot scatter replaces tensor.scatter_.
"""

import jax
import jax.numpy as jnp


def build_sim(context):
    """Row-normalized cosine similarity matrix (utils.py:133-136)."""
    norm = jnp.linalg.norm(context, axis=-1, keepdims=True)
    context_norm = context / norm
    return context_norm @ context_norm.T


def build_knn_neighbourhood(adj, topk):
    """Keep each row's top-k entries, zero elsewhere (utils.py:118-121)."""
    knn_val, knn_ind = jax.lax.top_k(adj, topk)
    n = adj.shape[-1]
    onehot = jax.nn.one_hot(knn_ind, n, dtype=adj.dtype)  # [..., k, n]
    return jnp.einsum("...k,...kn->...n", knn_val, onehot)


def compute_normalized_laplacian(adj):
    """D^-1/2 A D^-1/2 of a dense adjacency (utils.py:124-130)."""
    rowsum = jnp.sum(adj, axis=-1)
    d_inv_sqrt = jnp.where(rowsum > 0, rowsum ** -0.5, 0.0)
    return adj * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


def get_sparse_laplacian(edge_index, edge_weight, num_nodes,
                         normalization="none"):
    """Edge-list Laplacian normalization (utils.py:138-151; torch_scatter
    scatter_add -> segment_sum)."""
    row, col = edge_index[0], edge_index[1]
    deg = jax.ops.segment_sum(edge_weight, row, num_segments=num_nodes)
    if normalization == "sym":
        d = jnp.where(deg > 0, deg ** -0.5, 0.0)
        edge_weight = d[row] * edge_weight * d[col]
    elif normalization == "rw":
        d = jnp.where(deg > 0, 1.0 / deg, 0.0)
        edge_weight = d[row] * edge_weight
    return edge_index, edge_weight


def get_dense_laplacian(adj, normalization="none"):
    """(utils.py:153-168)"""
    if normalization == "sym":
        return compute_normalized_laplacian(adj)
    if normalization == "rw":
        rowsum = jnp.sum(adj, axis=-1)
        d_inv = jnp.where(rowsum > 0, 1.0 / rowsum, 0.0)
        return adj * d_inv[:, None]
    return adj


def build_knn_normalized_graph(adj, topk, is_sparse, norm_type):
    """Top-k sparsified + normalized graph (utils.py:170-183). The sparse
    variant returns (edge_index [2, n*k], edge_weight) instead of a torch
    sparse tensor."""
    knn_val, knn_ind = jax.lax.top_k(adj, topk)
    n = adj.shape[0]
    if is_sparse:
        row = jnp.repeat(jnp.arange(n), topk)
        col = knn_ind.reshape(-1)
        edge_index = jnp.stack([row, col])
        return get_sparse_laplacian(edge_index, knn_val.reshape(-1),
                                    num_nodes=n, normalization=norm_type)
    weighted = build_knn_neighbourhood(adj, topk)
    return get_dense_laplacian(weighted, normalization=norm_type)

# coding: utf-8
"""Loss kernels, numerically matching the reference (FoodRec/common/loss.py).

Functional JAX versions: every loss takes arrays and returns a scalar. An
optional `weight` vector supports masked/padded batches (the TPU epoch pads the
final partial batch to a static shape; the reference's torch DataLoader yields
a genuinely smaller last batch instead).
"""

import jax.numpy as jnp
from jax import nn as jnn


def _wmean(x, weight):
    if weight is None:
        return jnp.mean(x)
    return jnp.sum(x * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def safe_l2_norm(x, axis=-1, keepdims=False):
    """`jnp.linalg.norm(x, axis=axis)` with a finite gradient at x == 0.

    jnp.linalg.norm's VJP at an exactly-zero vector is 0/0 = NaN, and a NaN
    survives any downstream `maximum(n, eps)` clamp through the chain rule.
    Torch's F.normalize / cosine_similarity backward is clamped and returns
    0 there, so models trained against the reference never see the NaN.
    Value is identical to jnp.linalg.norm everywhere; gradient is 0 at 0
    (the torch subgradient convention).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    nonzero = sq > 0
    # double-where: keep both the primal and the sqrt VJP off the sq==0 branch
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, sq, 1.0)), 0.0)


def bpr_loss(pos_score, neg_score, gamma=1e-10, weight=None):
    """-log(gamma + sigmoid(pos - neg)).mean()  (reference loss.py:8-34)."""
    return _wmean(-jnp.log(gamma + jnn.sigmoid(pos_score - neg_score)), weight)


def bpr_loss_sum(pos_score, neg_score, weight=None):
    """Sum-form BPR used by SCHGN/FGCN: -sum(log sigmoid(pos - neg))
    (reference schgn.py:305-316). Uses log_sigmoid for stability."""
    vals = -jnn.log_sigmoid(pos_score - neg_score)
    if weight is not None:
        vals = vals * weight
    return jnp.sum(vals)


def emb_loss(*embeddings, norm=2, weight=None):
    """Sum of p-norms of each embedding tensor / batch size of the last one
    (reference loss.py:37-50). NOTE: the reference takes the *norm*, not the
    squared norm. `weight` masks padded rows out of the norms and the batch
    count."""
    if weight is None:
        total = sum(jnp.linalg.norm(e.reshape(-1), ord=norm) for e in embeddings)
        batch = embeddings[-1].shape[0]
        return total / batch
    total = 0.0
    for e in embeddings:
        w = weight.reshape((-1,) + (1,) * (e.ndim - 1))
        total = total + jnp.sqrt(jnp.sum((e * w) ** 2) + 1e-24)
    batch = jnp.maximum(jnp.sum(weight), 1.0)
    return total / batch


def l2_loss(*embeddings, weight=None):
    """0.5 * sum of squared entries, summed over tensors (reference loss.py:53-60)."""
    total = 0.0
    for e in embeddings:
        if weight is not None:
            w = weight.reshape((-1,) + (1,) * (e.ndim - 1))
            e = e * w
        total = total + 0.5 * jnp.sum(e ** 2)
    return total

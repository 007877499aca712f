# coding: utf-8
"""Self-supervised objectives (reference: FoodRec/models/pricai_modelx.py).

`correlation_distance` (dCor) is the loss CLUSSL ships with
(pricai_modelx.py:409-437); the others are the reference's alternative CL
objectives kept as public utilities (InfoNCE `cl_loss` :354-378, poly-view CL
:324-351, min-mutual-information :380-393, orthogonal :395-406).
"""

import jax
import jax.numpy as jnp
import numpy as np

from foodrec_tpu.common.loss import safe_l2_norm


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / (safe_l2_norm(x, axis=axis, keepdims=True) + eps)


def correlation_distance(x, y):
    """Distance correlation between two [B, D] batches
    (pricai_modelx.py:409-437)."""

    def centered_distance(X):
        r = jnp.sum(jnp.square(X), axis=1, keepdims=True)
        D = jnp.sqrt(jnp.maximum(r - 2 * X @ X.T + r.T, 0.0) + 1e-8)
        return (D - jnp.mean(D, axis=0, keepdims=True)
                - jnp.mean(D, axis=1, keepdims=True) + jnp.mean(D))

    def distance_covariance(D1, D2):
        n = D1.shape[0]
        return jnp.sqrt(jnp.maximum(jnp.sum(D1 * D2) / (n * n), 0.0) + 1e-8)

    D1 = centered_distance(x)
    D2 = centered_distance(y)
    dcov_12 = distance_covariance(D1, D2)
    dcov_11 = distance_covariance(D1, D1)
    dcov_22 = distance_covariance(D2, D2)
    return dcov_12 / jnp.sqrt(jnp.maximum(dcov_11 * dcov_22, 0.0) + 1e-10)


def cl_loss(hidden, hidden_norm=True, temperature=0.5):
    """SimCLR-style InfoNCE over a [2B, D] stack of two views
    (pricai_modelx.py:354-378; note the reference divides by batch_size)."""
    batch = hidden.shape[0] // 2
    LARGE = 1e9
    if hidden_norm:
        hidden = _l2_normalize(hidden)
    h1, h2 = hidden[:batch], hidden[batch:]
    labels = jnp.arange(batch)
    mask = jnp.eye(batch)

    logits_aa = h1 @ h1.T / temperature - mask * LARGE
    logits_bb = h2 @ h2.T / temperature - mask * LARGE
    logits_ab = h1 @ h2.T / temperature
    logits_ba = h2 @ h1.T / temperature

    def xent(logits):
        return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[
            jnp.arange(batch), labels])

    loss_a = xent(jnp.concatenate([logits_ab, logits_aa], axis=1))
    loss_b = xent(jnp.concatenate([logits_ba, logits_bb], axis=1))
    return (loss_a + loss_b) / batch


def poly_view_cl(i1, i2, i3, tau=0.5, method="arithmetic"):
    """Poly-view contrastive loss over three views (pricai_modelx.py:324-351)."""
    x = jnp.stack([i1, i2, i3], axis=1)           # [k, m, d]
    z = _l2_normalize(x)
    k, m, _ = x.shape
    scores = jnp.einsum("jmd,knd->jmnk", z, z) / tau

    def get_mask(beta):
        mask_sample = jnp.eye(k).reshape(k, 1, k)
        mask_beta = jnp.ones((1, m, 1)).at[:, beta, :].set(0.0)
        return mask_beta * mask_sample

    losses_alpha = []
    for alpha in range(m):
        per_beta = []
        for beta in range(m):
            if alpha == beta:
                continue
            logits = scores[:, alpha, :, :]        # [k, m, k]
            labels = jnp.arange(k) + beta * k
            logits = (logits - get_mask(beta) * 1e6).reshape(k, m * k)
            lsm = jax.nn.log_softmax(logits, axis=1)
            per_beta.append(-jnp.mean(lsm[jnp.arange(k), labels]))
        stacked = jnp.stack(per_beta, axis=-1)
        if method == "arithmetic":
            loss_alpha = jax.nn.logsumexp(stacked, axis=-1) - np.log(k)
        else:
            loss_alpha = jnp.mean(stacked, axis=-1)
        losses_alpha.append(loss_alpha)
    return jnp.mean(jnp.stack(losses_alpha, axis=-1))


def min_mutual_information(a, b, c):
    """(pricai_modelx.py:380-393)"""

    def cos(x, y):
        nx = jnp.maximum(safe_l2_norm(x, axis=-1), 1e-8)
        ny = jnp.maximum(safe_l2_norm(y, axis=-1), 1e-8)
        return jnp.sum(x * y, axis=-1) / (nx * ny)

    def term(x, y):
        return -jnp.log(1 - jnp.mean(cos(x, y)) + 1e-8)

    return (term(a, b) + term(a, c) + term(b, c)) / 3


def orthogonal_loss(a, b, c):
    """(pricai_modelx.py:395-406)"""

    def term(x, y):
        return jnp.mean(jnp.sum(x * y, axis=1) ** 2)

    return term(a, b) + term(a, c) + term(b, c)

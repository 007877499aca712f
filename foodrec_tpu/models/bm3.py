# coding: utf-8
"""BM3: bootstrapped multimodal SSL baseline (reference: FoodRec/models/bm3.py;
Zhou et al. WWW'23).

LightGCN encoder with residual item-id embeddings (bm3.py:87-98); BYOL-style
bootstrap losses against dropout-perturbed stop-gradient targets through a
shared linear predictor (bm3.py:100-150). The modality feature tables
themselves are trainable (`from_pretrained(freeze=False)`, bm3.py:53-58).

TPU notes: the whole loss is matmul + elementwise, one jit; the dropout
targets draw from the per-batch PRNG key (batch['key']) instead of torch
global RNG.
"""

import jax
import jax.numpy as jnp

from foodrec_tpu.common.init import (
    kaiming_uniform_linear,
    linear_apply,
    xavier_normal,
    xavier_uniform,
)
from foodrec_tpu.common.loss import emb_loss, safe_l2_norm
from foodrec_tpu.common.module import dropout
from foodrec_tpu.models import register
from foodrec_tpu.models.base import GeneralRecommender
from foodrec_tpu.ops.graph import sym_normalized_adjacency, ui_bipartite_edges
from foodrec_tpu.ops.spmm import Propagator, propagate_mean


def _cos(a, b):
    """torch cosine_similarity parity (eps=1e-8 on norms, NaN-safe grad)."""
    na = jnp.maximum(safe_l2_norm(a, axis=-1), 1e-8)
    nb = jnp.maximum(safe_l2_norm(b, axis=-1), 1e-8)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def _wmean(x, w):
    if w is None:
        return jnp.mean(x)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def _torch_linear(key, d_in, d_out, weight_init):
    """Linear whose weight gets `weight_init` but keeps torch's default
    uniform bias (the reference re-inits only .weight, bm3.py:49-58)."""
    kw, kb = jax.random.split(key)
    w = weight_init(kw, (d_out, d_in)).T
    bound = 1.0 / jnp.sqrt(d_in)
    b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


@register("BM3")
class BM3(GeneralRecommender):
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_layers = config["n_layers"]
        self.reg_weight = config["reg_weight"]
        self.cl_weight = config["cl_weight"]
        self.dropout = config["dropout"]

        rows, cols = ui_bipartite_edges(dataset.train_coo_matrix, self.n_users)
        adj = sym_normalized_adjacency(rows, cols, self.n_users + self.n_items)
        self.prop = self.register_propagator(
            "prop", Propagator(adj, impl=config["spmm_impl"] or "auto",
                       compute_dtype=config["spmm_dtype"]))

        # opt-in: frozen modality tables (see cikm_model.py note)
        self.freeze_mm = bool(config["freeze_modality_tables"])
        if self.freeze_mm:
            if self.v_feat is not None:
                self.register_buffer("image_frozen", jnp.asarray(self.v_feat))
            if self.t_feat is not None:
                self.register_buffer("text_frozen", jnp.asarray(self.t_feat))

    def init_params(self, key):
        d = self.embedding_size
        ks = jax.random.split(key, 8)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, d)),
            "predictor": _torch_linear(ks[2], d, d, xavier_normal),
        }
        if self.v_feat is not None:
            if not self.freeze_mm:
                params["image_embedding"] = jnp.asarray(self.v_feat)
            params["image_trs"] = _torch_linear(
                ks[3], self.v_feat.shape[1], d, xavier_normal)
        if self.t_feat is not None:
            if not self.freeze_mm:
                params["text_embedding"] = jnp.asarray(self.t_feat)
            params["text_trs"] = _torch_linear(
                ks[4], self.t_feat.shape[1], d, xavier_normal)
        return params

    def _mm_table(self, params, name):
        if self.freeze_mm:
            return getattr(self, f"{name}_frozen")
        return params[f"{name}_embedding"]

    def _gnn_encode(self, params):
        ego = jnp.concatenate([params["user_embedding"],
                               params["item_id_embedding"]], axis=0)
        all_emb = propagate_mean(self.prop, ego, self.n_layers)
        u = all_emb[: self.n_users]
        i = all_emb[self.n_users:] + params["item_id_embedding"]
        return u, i

    def forward(self, params):
        u, i = self._gnn_encode(params)
        return (linear_apply(params["predictor"], u),
                linear_apply(params["predictor"], i))

    def calculate_loss(self, params, batch):
        user = batch["u_id"]
        pos_item = batch["pos_i_id"]
        w = batch.get("weight")
        key = batch.get("key", jax.random.PRNGKey(0))
        k_u, k_i, k_t, k_v = jax.random.split(key, 4)

        u_online_ori, i_online_ori = self._gnn_encode(params)
        t_feat_online = v_feat_online = None
        if self.t_feat is not None:
            t_feat_online = linear_apply(params["text_trs"],
                                         self._mm_table(params, "text"))
        if self.v_feat is not None:
            v_feat_online = linear_apply(params["image_trs"],
                                         self._mm_table(params, "image"))

        # stop-gradient dropout targets (bm3.py:108-122)
        u_target = dropout(k_u, jax.lax.stop_gradient(u_online_ori),
                           self.dropout, False)[user]
        i_target = dropout(k_i, jax.lax.stop_gradient(i_online_ori),
                           self.dropout, False)[pos_item]

        u_online = linear_apply(params["predictor"], u_online_ori)[user]
        i_online = linear_apply(params["predictor"], i_online_ori)[pos_item]

        loss_t = loss_v = loss_tv = loss_vt = 0.0
        if self.t_feat is not None:
            t_target = dropout(k_t, jax.lax.stop_gradient(t_feat_online),
                               self.dropout, False)[pos_item]
            t_online = linear_apply(params["predictor"], t_feat_online)[pos_item]
            loss_t = _wmean(1 - _cos(t_online, i_target), w)
            loss_tv = _wmean(1 - _cos(t_online, t_target), w)
        if self.v_feat is not None:
            v_target = dropout(k_v, jax.lax.stop_gradient(v_feat_online),
                               self.dropout, False)[pos_item]
            v_online = linear_apply(params["predictor"], v_feat_online)[pos_item]
            loss_v = _wmean(1 - _cos(v_online, i_target), w)
            loss_vt = _wmean(1 - _cos(v_online, v_target), w)

        loss_ui = _wmean(1 - _cos(u_online, i_target), w)
        loss_iu = _wmean(1 - _cos(i_online, u_target), w)

        # reg is over the full propagated matrices (bm3.py:150), not the batch
        reg = self.reg_weight * emb_loss(u_online_ori, i_online_ori)
        return (loss_ui + loss_iu, reg,
                self.cl_weight * (loss_t + loss_v + loss_tv + loss_vt))

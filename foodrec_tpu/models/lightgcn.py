# coding: utf-8
"""LightGCN baseline (reference: FoodRec/models/lightgcn.py).

The shipped reference variant (flagD=1) replaces item ego-embeddings with a
linear projection of the *text* features (lightgcn.py:73-74, 122-132); the
free item table still exists and only feeds the reg loss (lightgcn.py:167-175)
— reproduced faithfully. `flagD` selects the modality: 0 image, 1 text,
2 ingredient-mean, 3 free-id (configs/model/LightGCN.yaml:30).

TPU design: one propagator over the joint (users+items) node space, ego
embeddings assembled as a single [N+M, D] matrix, propagation = n_layers SpMM
hops with layer-mean readout, all inside the jit'd loss/score functions.
"""

import jax
import jax.numpy as jnp

import numpy as np

from foodrec_tpu.common.init import linear_apply, xavier_uniform
from foodrec_tpu.common.loss import bpr_loss, emb_loss
from foodrec_tpu.models import register
from foodrec_tpu.models.base import GeneralRecommender
from foodrec_tpu.ops.graph import sym_normalized_adjacency, ui_bipartite_edges
from foodrec_tpu.ops.spmm import Propagator, propagate_mean


@register("LightGCN")
class LightGCN(GeneralRecommender):
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_layers = config["n_layers"]
        self.reg_weight = config["reg_weight"]
        flag = config["flagD"]
        self.flagD = int(flag[0] if isinstance(flag, (list, tuple)) else (flag or 3))

        rows, cols = ui_bipartite_edges(dataset.train_coo_matrix, self.n_users)
        adj = sym_normalized_adjacency(rows, cols, self.n_users + self.n_items)
        self.prop = self.register_propagator(
            "prop", Propagator(adj, impl=config["spmm_impl"] or "auto",
                       compute_dtype=config["spmm_dtype"]))

        # the feature copy is TRAINABLE in the reference
        # (from_pretrained(freeze=False), lightgcn.py:73); it lives in params
        # unless freeze_modality_tables opts out
        self.freeze_mm = bool(config["freeze_modality_tables"])
        if self.flagD == 0:
            self.feat = self.v_feat
        elif self.flagD == 1:
            self.feat = self.t_feat
        elif self.flagD == 2:
            # mean of ingredient one-hots is modeled as the padded code matrix;
            # project the mean-pooled ingredient id embedding at runtime
            self.feat = None
        else:
            self.feat = None
        if self.freeze_mm and self.feat is not None:
            # register at construction time (the Trainer snapshots buffers
            # before init_params runs)
            self.register_buffer("feat_frozen", jnp.asarray(self.feat))

    def init_params(self, key):
        d = self.embedding_size
        ks = jax.random.split(key, 4)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_embedding": xavier_uniform(ks[1], (self.n_items, d)),
        }
        if self.feat is not None:
            # `image_trs` is created AFTER the xavier apply pass in the
            # reference (lightgcn.py:72-74), so it keeps torch's default
            # Linear init; named image_trs even when fed text features
            kw, kb = jax.random.split(ks[2])
            bound = 1.0 / np.sqrt(self.feat.shape[1])
            params["image_trs"] = {
                "w": jax.random.uniform(kw, (self.feat.shape[1], d),
                                        minval=-bound, maxval=bound),
                "b": jax.random.uniform(kb, (d,), minval=-bound,
                                        maxval=bound),
            }
            if not self.freeze_mm:
                params["image_embedding"] = jnp.asarray(self.feat)
        return params

    def _ego(self, params):
        if self.feat is not None:
            table = (self.feat_frozen if self.freeze_mm
                     else params["image_embedding"])
            item_ego = linear_apply(params["image_trs"], table)
        else:
            item_ego = params["item_embedding"]
        return jnp.concatenate([params["user_embedding"], item_ego], axis=0)

    def forward(self, params):
        all_emb = propagate_mean(self.prop, self._ego(params), self.n_layers)
        return all_emb[: self.n_users], all_emb[self.n_users:]

    def calculate_loss(self, params, batch):
        user = batch["u_id"]
        pos = batch["pos_i_id"]
        neg = batch["neg_i_id"]
        w = batch.get("weight")

        user_all, item_all = self.forward(params)
        u_e = user_all[user]
        pos_scores = jnp.sum(u_e * item_all[pos], axis=1)
        neg_scores = jnp.sum(u_e * item_all[neg], axis=1)
        mf_loss = bpr_loss(pos_scores, neg_scores, weight=w)

        reg_loss = self.reg_weight * emb_loss(
            params["user_embedding"][user],
            params["item_embedding"][pos],
            params["item_embedding"][neg],
            weight=w,
        )
        return mf_loss, reg_loss

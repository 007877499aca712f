# coding: utf-8
"""FGCN: hierarchical GNN baseline (reference: FoodRec/models/fgcn.py).

Three stacked graphs (fgcn.py:149-183): ingredient–ingredient GCN with one
shared linear (`w1_conv`) per hop, then item–ingredient and user–item
Aggregator stacks (gcn / graphsage / bi-interaction, fgcn.py:219-263) with
L2-normalized per-layer outputs and layer-mean readout. All adjacencies are
row-normalized D^-1 A over the symmetrized edge set (fgcn.py:84-106).

Faithful quirk: gnn_encode returns the *raw* item id table as the item-side
embedding (fgcn.py:185-194) — item propagation output only flows into users.
"""

import jax
import jax.numpy as jnp
import numpy as np

from foodrec_tpu.common.init import linear_apply, linear_params, xavier_normal
from foodrec_tpu.common.loss import bpr_loss, emb_loss, safe_l2_norm
from foodrec_tpu.common.module import dropout
from foodrec_tpu.models import register
from foodrec_tpu.models.base import GeneralRecommender
from foodrec_tpu.ops.graph import row_normalized_adjacency
from foodrec_tpu.ops.spmm import Propagator


@register("FGCN")
class FGCN(GeneralRecommender):
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_ingredients = dataset.num_ingredients
        self.reg_weight = config["reg_weight"]
        self.aggregator_type = config["aggregator_type"]
        self.mess_dropout = config["mess_dropout"]
        self.layers = config["layers"]
        self.n_layers = config["n_layers"]

        impl = config["spmm_impl"] or "auto"
        cdt = config["spmm_dtype"]
        nu, ni, ng = self.n_users, self.n_items, self.n_ingredients

        ur = np.asarray(dataset.uRecipe_triples, dtype=np.int64)
        ri = np.asarray(dataset.rIngre_triples, dtype=np.int64)
        ii = np.asarray(dataset.iIngre_triples, dtype=np.int64)

        # (recipe+n_users, user) / (ingre+n_items, recipe) / (t, h) edge sets,
        # symmetrized + row-normalized (fgcn.py:108-147, 84-106)
        self.ru_prop = self.register_propagator(
            "ru_prop", Propagator(row_normalized_adjacency(
                ur[:, 1] + nu, ur[:, 0], nu + ni), impl=impl, compute_dtype=cdt))
        self.ir_prop = self.register_propagator(
            "ir_prop", Propagator(row_normalized_adjacency(
                ri[:, 1] + ni, ri[:, 0], ni + ng), impl=impl, compute_dtype=cdt))
        self.ii_prop = self.register_propagator(
            "ii_prop", Propagator(row_normalized_adjacency(
                ii[:, 1], ii[:, 0], ng), impl=impl, compute_dtype=cdt))

    def init_params(self, key):
        d = self.embedding_size
        ks = jax.random.split(key, 6)
        params = {
            "user_embedding": xavier_normal(ks[0], (self.n_users, d)),
            "item_id_embedding": xavier_normal(ks[1], (self.n_items, d)),
            "ingre_embedding": xavier_normal(ks[2],
                                             (self.n_ingredients + 1, d)),
            "w1_conv": linear_params(ks[3], d, d, init=xavier_normal),
        }

        def agg_params(key, dims_in, dims_out):
            out = []
            for d_in, d_out in zip(dims_in, dims_out):
                k1, k2, key = jax.random.split(key, 3)
                if self.aggregator_type == "gcn":
                    out.append({"W": linear_params(k1, d_in, d_out,
                                                   init=xavier_normal)})
                elif self.aggregator_type == "graphsage":
                    out.append({"W": linear_params(k1, 2 * d_in, d_out,
                                                   init=xavier_normal)})
                elif self.aggregator_type == "bi":
                    out.append({"W1": linear_params(k1, d_in, d_out,
                                                    init=xavier_normal),
                                "W2": linear_params(k2, d_in, d_out,
                                                    init=xavier_normal)})
                else:
                    raise NotImplementedError(self.aggregator_type)
            return out

        params["ir_aggs"] = agg_params(ks[4], self.layers[:-1], self.layers[1:])
        params["ru_aggs"] = agg_params(ks[5], self.layers[:-1], self.layers[1:])
        return params

    def _aggregate(self, p, prop, x, key, deterministic):
        """One Aggregator hop (fgcn.py:246-263)."""
        side = prop(x)
        if self.aggregator_type == "gcn":
            out = jax.nn.leaky_relu(linear_apply(p["W"], x + side))
        elif self.aggregator_type == "graphsage":
            out = jax.nn.leaky_relu(linear_apply(
                p["W"], jnp.concatenate([x, side], axis=1)))
        else:  # bi-interaction
            out = (jax.nn.leaky_relu(linear_apply(p["W1"], x + side))
                   + jax.nn.leaky_relu(linear_apply(p["W2"], x * side)))
        return dropout(key, out, self.mess_dropout, deterministic)

    def _ingre_table(self, params):
        w = params["ingre_embedding"]
        return jnp.concatenate([w[:-1], jax.lax.stop_gradient(w[-1:])], axis=0)

    def gnn_encode(self, params, key=None, deterministic=True):
        if key is None:
            key = jax.random.PRNGKey(0)

        # ingredient–ingredient GCN: shared linear then propagate (fgcn:149-158)
        x = self._ingre_table(params)[:-1]
        acc = x
        for _ in range(self.n_layers):
            x = self.ii_prop(linear_apply(params["w1_conv"], x))
            acc = acc + x
        ingre_ii = acc / (self.n_layers + 1)

        def stack(props, aggs, ego):
            nonlocal key
            outs = [ego]
            x = ego
            for p in aggs:
                key, k = jax.random.split(key)
                x = self._aggregate(p, props, x, k, deterministic)
                n = x / jnp.maximum(
                    safe_l2_norm(x, axis=1, keepdims=True), 1e-12)
                outs.append(n)
            return sum(outs) / len(outs)

        ir_all = stack(self.ir_prop, params["ir_aggs"],
                       jnp.concatenate([params["item_id_embedding"],
                                        ingre_ii], axis=0))
        item_ir = ir_all[: self.n_items]
        ingre_ir = ir_all[self.n_items:]

        ru_all = stack(self.ru_prop, params["ru_aggs"],
                       jnp.concatenate([params["user_embedding"],
                                        item_ir], axis=0))
        user_ru = ru_all[: self.n_users]
        # items returned raw (fgcn.py:194)
        return user_ru, params["item_id_embedding"], ingre_ir

    def forward(self, params):
        return self.gnn_encode(params)[:2]

    def calculate_loss(self, params, batch):
        user = batch["u_id"]
        pos_item = batch["pos_i_id"]
        neg_item = batch["neg_i_id"]
        w = batch.get("weight")
        key = batch.get("key", jax.random.PRNGKey(0))

        user_all, item_all, _ = self.gnn_encode(params, key,
                                                deterministic=False)
        u_e = user_all[user]
        pos_e = item_all[pos_item]
        neg_e = item_all[neg_item]
        # mean-form logsigmoid BPR (fgcn.py:196-203)
        mf = bpr_loss(jnp.sum(u_e * pos_e, axis=1),
                      jnp.sum(u_e * neg_e, axis=1), weight=w)
        reg = self.reg_weight * emb_loss(u_e, pos_e, neg_e, weight=w)
        return mf, reg

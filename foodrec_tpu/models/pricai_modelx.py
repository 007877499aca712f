# coding: utf-8
"""PRICAI_ModelX / CLUSSL (PRICAI 2024)
(reference: FoodRec/models/pricai_modelx.py).

Three parallel item-side bipartite graphs — item↔ingredient, item↔image-cluster,
item↔text-cluster (k-means prototypes as learnable nodes) — each propagated
n_ri_layers; the summed item view feeds n_ui_layers of user–item LightGCN
(pricai_modelx.py:179-230). Self-supervised decorrelation = pairwise distance
correlation (dCor) between the three item views (pricai_modelx.py:263,
409-437). Optional pretrained k-means centers as prototype init
(`use_center_embedding`, pricai_modelx.py:75-86).

The reference keeps several alternative CL losses as dead code
(CL_loss InfoNCE :354-378, poly_view_cl :324-351, min_mutual_information
:380-393, OrthogonalLoss :395-406); they are provided in
foodrec_tpu.common.ssl_losses for capability parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from foodrec_tpu.common.init import linear_apply, xavier_normal, xavier_uniform
from foodrec_tpu.common.loss import bpr_loss, emb_loss
from foodrec_tpu.common.ssl_losses import correlation_distance
from foodrec_tpu.models import register
from foodrec_tpu.models.base import GeneralRecommender
from foodrec_tpu.ops.graph import (
    bipartite_offset_edges,
    sym_normalized_adjacency,
    ui_bipartite_edges,
)
from foodrec_tpu.ops.spmm import Propagator, propagate_mean


def _torch_linear(key, d_in, d_out, weight_init):
    kw, kb = jax.random.split(key)
    w = weight_init(kw, (d_out, d_in)).T
    bound = 1.0 / np.sqrt(d_in)
    b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


@register("PRICAI_ModelX")
class PRICAI_ModelX(GeneralRecommender):
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_ingredients = dataset.num_ingredients
        self.n_ri_layers = config["n_ri_layers"]
        self.n_ui_layers = config["n_ui_layers"]
        self.reg_weight = config["reg_weight"]
        self.loss_cl = config["loss_cl"]
        nc = config["n_cluster"]
        self.n_cluster = int(nc[0] if isinstance(nc, (list, tuple)) else nc)

        impl = config["spmm_impl"] or "auto"
        cdt = config["spmm_dtype"]
        rows, cols = ui_bipartite_edges(dataset.train_coo_matrix, self.n_users)
        self.ui_prop = self.register_propagator(
            "ui_prop", Propagator(sym_normalized_adjacency(
                rows, cols, self.n_users + self.n_items), impl=impl, compute_dtype=cdt))

        def cluster_prop(triples, n_extra):
            t = np.asarray(triples, dtype=np.int64)
            r, c = bipartite_offset_edges(t, offset_head=0,
                                          offset_tail=self.n_items)
            return Propagator(sym_normalized_adjacency(
                r, c, self.n_items + n_extra), impl=impl, compute_dtype=cdt)

        self.ingre_prop = self.register_propagator(
            "ingre_prop", cluster_prop(dataset.rIngre_triples,
                                        self.n_ingredients))
        self.image_prop = self.register_propagator(
            "image_prop", cluster_prop(dataset.image_cluster_triples,
                                        self.n_cluster))
        self.text_prop = self.register_propagator(
            "text_prop", cluster_prop(dataset.text_cluster_triples,
                                       self.n_cluster))

        self.v_center = self.t_center = None
        if config["use_center_embedding"]:
            p = config["interaction_data_path"] + "mm_cluster/"
            self.v_center = jnp.asarray(
                np.load(p + "image_center.npy").astype(np.float32))
            self.t_center = jnp.asarray(
                np.load(p + "text_center.npy").astype(np.float32))

    def init_params(self, key):
        d = self.embedding_size
        ks = jax.random.split(key, 8)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_embedding": xavier_uniform(ks[1], (self.n_items, d)),
            "ingre_embedding": xavier_uniform(
                ks[2], (self.n_ingredients + 1, d)),
        }
        if self.v_center is not None:
            params["image_prototype_embedding"] = self.v_center
            params["image_trs"] = _torch_linear(
                ks[3], self.v_center.shape[1], d, xavier_normal)
        else:
            params["image_prototype_embedding"] = xavier_uniform(
                ks[3], (self.n_cluster, d))
        if self.t_center is not None:
            params["text_prototype_embedding"] = self.t_center
            params["text_trs"] = _torch_linear(
                ks[4], self.t_center.shape[1], d, xavier_normal)
        else:
            params["text_prototype_embedding"] = xavier_uniform(
                ks[4], (self.n_cluster, d))
        return params

    def _ingre_table(self, params):
        w = params["ingre_embedding"]
        return jnp.concatenate([w[:-1], jax.lax.stop_gradient(w[-1:])], axis=0)

    def forward(self, params):
        item = params["item_embedding"]

        def view(prop, proto):
            ego = jnp.concatenate([item, proto], axis=0)
            out = propagate_mean(prop, ego, self.n_ri_layers)
            return out[: self.n_items], out[self.n_items:]

        item_ingre, _ = view(self.ingre_prop, self._ingre_table(params)[:-1])
        if self.v_center is not None:
            img_proto = linear_apply(params["image_trs"],
                                     params["image_prototype_embedding"])
        else:
            img_proto = params["image_prototype_embedding"]
        item_image, _ = view(self.image_prop, img_proto)
        if self.t_center is not None:
            txt_proto = linear_apply(params["text_trs"],
                                     params["text_prototype_embedding"])
        else:
            txt_proto = params["text_prototype_embedding"]
        item_text, _ = view(self.text_prop, txt_proto)

        item_emb = item_ingre + item_image + item_text
        ui_ego = jnp.concatenate([params["user_embedding"], item_emb], axis=0)
        ui_all = propagate_mean(self.ui_prop, ui_ego, self.n_ui_layers)
        return (ui_all[: self.n_users], ui_all[self.n_users:],
                (item_image, item_text, item_ingre))

    def calculate_loss(self, params, batch):
        user = batch["u_id"]
        pos_item = batch["pos_i_id"]
        neg_item = batch["neg_i_id"]
        w = batch.get("weight")
        all_item = jnp.concatenate([pos_item, neg_item])

        user_all, item_all, (image_v, text_v, ingre_v) = self.forward(params)
        item_image = image_v[all_item]
        item_text = text_v[all_item]
        item_ingre = ingre_v[all_item]

        u_e = user_all[user]
        mf_loss = bpr_loss(jnp.sum(u_e * item_all[pos_item], axis=1),
                           jnp.sum(u_e * item_all[neg_item], axis=1),
                           weight=w)

        # dCor between the three views; the epoch's padded tail rows are
        # wrap-around duplicates of real samples, so no masking is needed
        cl = (correlation_distance(item_image, item_text)
              + correlation_distance(item_image, item_ingre)
              + correlation_distance(item_ingre, item_text))

        reg_loss = self.reg_weight * emb_loss(
            params["user_embedding"][user],
            params["item_embedding"][pos_item],
            params["item_embedding"][neg_item],
            weight=w,
        )
        return mf_loss, self.loss_cl * cl, reg_loss

# coding: utf-8
"""CIKM_Model / HealthRec (CIKM 2024) — the flagship model
(reference: FoodRec/models/cikm_model.py).

Architecture (cikm_model.py:182-281):
  * two-stage LightGCN: recipe–ingredient propagation (n_layers) over an
    [items; ingredients] node space feeds user–item propagation (ui_layers)
  * transformer encoder over the padded 20-token ingredient sequences with
    key-padding mask (cikm_model.py:27-32, 228-238)
  * two target-attention blocks: multimodal (image+text) queries over encoded
    ingredients -> item_health, and encoded ingredients over multimodal
    features -> item_mm (cikm_model.py:240-246)
  * heads: sigmoid multi-hot health prediction with summed BCE
    (cikm_model.py:251-253), hinge knowledge-distillation loss
    1 - cos(item_know, item_emb) thresholded (cikm_model.py:263-264, 304-308),
    BPR + EmbLoss reg

Faithful quirks kept:
  * forward()'s propagated ingredient output is discarded; the loss uses the
    raw ingre_embedding table (cikm_model.py:223-224)
  * the ingredient pad row (id = n_ingredients) is xavier-initialized (the
    apply() re-init pass overwrites the padding_idx zeroing) and TRAINS
    through the encoder/KD paths, which index `ingre_embedding.weight`
    directly (cikm_model.py:224, 230); padding_idx zeroes its gradient only
    on the reg path's module calls (cikm_model.py:270-271)
  * item_know sums normalized rows over all 20 positions (pads included) and
    divides by the true ingredient count (cikm_model.py:248-249)
"""

import jax
import jax.numpy as jnp
import numpy as np

from foodrec_tpu.common.init import (
    linear_apply,
    xavier_normal,
    xavier_uniform,
)
from foodrec_tpu.common.loss import bpr_loss, emb_loss, safe_l2_norm
from foodrec_tpu.common.module import (
    mlp_2layer_apply,
    mlp_2layer_params,
    target_attention_apply,
    target_attention_params,
    transformer_encoder_apply,
    transformer_encoder_params,
)
from foodrec_tpu.models import register
from foodrec_tpu.models.base import GeneralRecommender
from foodrec_tpu.ops.graph import (
    bipartite_offset_edges,
    sym_normalized_adjacency,
    ui_bipartite_edges,
)
from foodrec_tpu.ops.spmm import Propagator, propagate_mean


def _normalize(x, axis=-1):
    """F.normalize parity: x / max(||x||, 1e-12) (NaN-safe grad at 0)."""
    n = safe_l2_norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


def _cos(a, b):
    na = jnp.maximum(safe_l2_norm(a, axis=-1), 1e-8)
    nb = jnp.maximum(safe_l2_norm(b, axis=-1), 1e-8)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def _torch_linear(key, d_in, d_out, weight_init):
    kw, kb = jax.random.split(key)
    w = weight_init(kw, (d_out, d_in)).T
    bound = 1.0 / np.sqrt(d_in)
    b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


@register("CIKM_Model")
class CIKM_Model(GeneralRecommender):
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_ingredients = dataset.num_ingredients
        self.n_health_level = (
            len(dataset.health_level_multi_hot[0])
            if config["use_health_level_multi_hot"]
            else dataset.num_health_level)
        self.n_layers = config["n_layers"]
        self.ui_layers = config["ui_layers"]
        self.reg_weight = config["reg_weight"]
        self.loss_kd = config["loss_kd"]
        self.loss_health = config["loss_health"]
        self.kd_threshold = config["kd_threshold"]
        self.nhead = config["num_attention_heads"]
        self.n_enc_layers = config["num_hidden_layers"]
        self.attn_dropout = config["attention_probs_dropout_prob"]
        self.hidden_act = config["hidden_act"]

        # user–item graph (cikm_model.py:139-180)
        rows, cols = ui_bipartite_edges(dataset.train_coo_matrix, self.n_users)
        ui_adj = sym_normalized_adjacency(rows, cols,
                                          self.n_users + self.n_items)
        self.ui_prop = self.register_propagator(
            "ui_prop", Propagator(ui_adj, impl=config["spmm_impl"] or "auto",
                       compute_dtype=config["spmm_dtype"]))

        # recipe–ingredient graph over items+ingredients (cikm_model.py:91-134)
        ri_rows, ri_cols = bipartite_offset_edges(
            dataset.rIngre_triples, offset_head=0, offset_tail=self.n_items)
        ri_adj = sym_normalized_adjacency(
            ri_rows, ri_cols, self.n_items + self.n_ingredients)
        self.ri_prop = self.register_propagator(
            "ri_prop", Propagator(ri_adj, impl=config["spmm_impl"] or "auto",
                       compute_dtype=config["spmm_dtype"]))

        dd = self.dd
        self.ingre_codes = self.register_buffer(
            "ingre_codes", jnp.asarray(dd.ingre_codes))    # [n_items, 20]
        self.ingre_num = self.register_buffer(
            "ingre_num", jnp.asarray(dd.ingre_num))        # [n_items]
        mh = dd.health_mh
        if mh is None:
            mh = np.zeros((self.n_items, self.n_health_level), np.float32)
        self.health_mh = self.register_buffer(
            "health_mh", jnp.asarray(mh))                  # [n_items, H]

        # opt-in production knob (no reference equivalent): keep the raw
        # modality tables frozen buffers instead of trainable params — the
        # reference trains the full [n_items, 2048] copy
        # (from_pretrained(freeze=False), cikm_model.py:85-89), which costs a
        # dense grad + Adam pass over ~60M params per step (~30% of the step
        # at Foodcom scale, and the bulk of HBM at XL catalogs)
        self.freeze_mm = bool(config["freeze_modality_tables"])
        if self.freeze_mm:
            self.register_buffer("image_frozen", jnp.asarray(self.v_feat))
            self.register_buffer("text_frozen", jnp.asarray(self.t_feat))

    def init_params(self, key):
        d = self.embedding_size
        ks = jax.random.split(key, 10)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_embedding": xavier_uniform(ks[1], (self.n_items, d)),
            # pad row (last) trains via encoder/KD, frozen on the reg path
            "ingre_embedding": xavier_uniform(
                ks[2], (self.n_ingredients + 1, d)),
            "encoder": transformer_encoder_params(ks[3], d, 4 * d,
                                                  self.n_enc_layers),
            "mm_target_atten": target_attention_params(d // self.nhead),
            "ingre_target_atten": target_attention_params(d // self.nhead),
            "health_mlp": mlp_2layer_params(ks[4], d, d, self.n_health_level),
            "image_trs": _torch_linear(ks[5], self.v_feat.shape[1], d,
                                       xavier_normal),
            "text_trs": _torch_linear(ks[6], self.t_feat.shape[1], d,
                                      xavier_normal),
        }
        if not self.freeze_mm:
            params["image_embedding"] = jnp.asarray(self.v_feat)
            params["text_embedding"] = jnp.asarray(self.t_feat)
        return params

    def _mm_table(self, params, name):
        if self.freeze_mm:
            return getattr(self, f"{name}_frozen")
        return params[f"{name}_embedding"]

    def _mm_rows(self, params, batch, name, idx):
        """Batch rows of a modality table — via the row-sparse fast path
        when the trainer pre-gathered them (engine/sparse_adam.py)."""
        if self.freeze_mm:
            return getattr(self, f"{name}_frozen")[idx]
        return self.gather_rows(params, batch, f"{name}_embedding", idx)

    def row_sparse_tables(self, batch):
        if self.freeze_mm:
            return {}
        items2 = jnp.concatenate([batch["pos_i_id"], batch["neg_i_id"]])
        return {"image_embedding": items2, "text_embedding": items2}

    def _ingre_table(self, params):
        """Raw table, pad row INCLUDED and trainable: the reference reads
        `self.ingre_embedding.weight` directly (cikm_model.py:224, 230), so
        torch's padding_idx grad-zeroing does NOT apply on the encoder/KD
        paths — the pad row receives gradient there (verified by the f64
        gradient certificate; freezing it was a r3 deviation of ~3e-5 relmax
        on the ingredient-table gradient every step)."""
        return params["ingre_embedding"]

    def _ingre_table_reg(self, params):
        """Reg-path table: cikm_model.py:270-271 goes through the
        nn.Embedding module call, where padding_idx DOES zero the pad-row
        gradient (torch embedding backward skips padding_idx)."""
        w = params["ingre_embedding"]
        return jnp.concatenate([w[:-1], jax.lax.stop_gradient(w[-1:])], axis=0)

    def forward(self, params):
        ingre = self._ingre_table(params)
        ir_ego = jnp.concatenate([params["item_embedding"], ingre[:-1]], axis=0)
        ir_all = propagate_mean(self.ri_prop, ir_ego, self.n_layers)
        item_ir = ir_all[: self.n_items]
        ingre_ir = ir_all[self.n_items:]

        ui_ego = jnp.concatenate([params["user_embedding"], item_ir], axis=0)
        ui_all = propagate_mean(self.ui_prop, ui_ego, self.ui_layers)
        return ui_all[: self.n_users], ui_all[self.n_users:], ingre_ir

    def calculate_loss(self, params, batch):
        user = batch["u_id"]
        pos_item = batch["pos_i_id"]
        neg_item = batch["neg_i_id"]
        w = batch.get("weight")
        key = batch.get("key", jax.random.PRNGKey(0))
        w2 = None if w is None else jnp.concatenate([w, w])

        items2 = jnp.concatenate([pos_item, neg_item])       # [2B]
        ingredients = self.ingre_codes[items2]               # [2B, 20]
        ingre_num = self.ingre_num[items2]                   # [2B]
        health_level = self.health_mh[items2]                # [2B, H]

        user_all, item_all, _ = self.forward(params)
        ingre_table = self._ingre_table(params)

        # --- ingredient transformer (cikm_model.py:228-238) ---------------
        ingr_emb = ingre_table[ingredients]                  # [2B, 20, D]
        pad_mask = ingredients == self.n_ingredients
        encoded = transformer_encoder_apply(
            params["encoder"], ingr_emb, self.nhead, pad_mask=pad_mask,
            act=self.hidden_act, drop_rate=self.attn_dropout, key=key,
            deterministic=False)

        # --- multimodal queries (cikm_model.py:240-246) --------------------
        image_feats = linear_apply(params["image_trs"],
                                   self._mm_rows(params, batch, "image",
                                                 items2))
        text_feats = linear_apply(params["text_trs"],
                                  self._mm_rows(params, batch, "text",
                                                items2))
        mm_query = jnp.stack([image_feats, text_feats], axis=1)  # [2B, 2, D]

        item_health, _ = target_attention_apply(
            params["mm_target_atten"], mm_query, encoded, self.nhead,
            seq_ids=ingredients, padding_idx=self.n_ingredients)
        item_mm, _ = target_attention_apply(
            params["ingre_target_atten"], encoded, mm_query, self.nhead)

        # pads included in the sum, true count in the divisor (cikm:248-249).
        # NB: torch F.normalize defaults to dim=1 — on these 3-D tensors that
        # is the *position* axis, not features (cikm_model.py:248, 251)
        item_know = (jnp.sum(_normalize(item_mm, axis=1), axis=1)
                     / ingre_num[:, None])

        health_logit = mlp_2layer_apply(
            params["health_mlp"],
            jnp.mean(_normalize(item_health, axis=1), axis=1))
        # BCE in logit space: log(sigmoid(z)) == -softplus(-z), so this equals
        # torch.nn.BCELoss's clamp(log(p), min=-100) forward exactly — but the
        # gradient stays finite when the sigmoid saturates (sigmoid+clip(log)
        # yields 0*inf=NaN there; torch avoids it by clamping the backward
        # denominator, BCELoss docs / cikm_model.py:250-253).
        log_p = jnp.maximum(-jax.nn.softplus(-health_logit), -100.0)
        log_1mp = jnp.maximum(-jax.nn.softplus(health_logit), -100.0)
        bce = -(health_level * log_p + (1 - health_level) * log_1mp)
        if w2 is not None:
            bce = bce * w2[:, None]
        health_loss = jnp.sum(bce)

        # --- BPR (cikm_model.py:255-261) ----------------------------------
        u_e = user_all[user]
        pos_e = item_all[pos_item]
        neg_e = item_all[neg_item]
        mf_loss = bpr_loss(jnp.sum(u_e * pos_e, axis=1),
                           jnp.sum(u_e * neg_e, axis=1), weight=w)

        # --- KD hinge (cikm_model.py:263-264, 304-308) ---------------------
        cos = _cos(item_know, jnp.concatenate([pos_e, neg_e], axis=0))
        if w2 is None:
            kd = 1 - jnp.mean(cos)
        else:
            kd = 1 - jnp.sum(cos * w2) / jnp.maximum(jnp.sum(w2), 1.0)
        kd_loss = jnp.maximum(0.0, kd - self.kd_threshold)

        # --- reg (cikm_model.py:266-279) -----------------------------------
        reg_table = self._ingre_table_reg(params)
        reg_loss = self.reg_weight * emb_loss(
            params["user_embedding"][user],
            params["item_embedding"][pos_item],
            params["item_embedding"][neg_item],
            reg_table[self.ingre_codes[pos_item]],
            reg_table[self.ingre_codes[neg_item]],
            weight=w,
        )
        return (mf_loss, self.loss_health * health_loss,
                self.loss_kd * kd_loss, reg_loss)

# coding: utf-8
"""SCHGN: heterogeneous-graph multimodal recommender, the reference's default
model (reference: FoodRec/models/schgn.py; runner.py default -m SCHGN).

Pieces (schgn.py line refs):
  * hetero GCN over users+items+ingredients+calorie-levels with directed
    edges items->users, ingredients->items, cal->items, single
    GCNConv(64,64)+tanh layer (:29-41, :139-151) — replicated via a
    gcn_norm-parity adjacency (ops/graph.py gcn_conv_adjacency) and one SpMM
  * free truncated-normal(0.01) embedding tables with a frozen zero pad row
    and a learnable mask token for ingredients (:80-89, :120-125)
  * two-level additive attention: ingredient-level (user+image conditioned,
    sequence-masked, :159-184) and component-level over
    [item, ingredients, image, health] (:186-206)
  * score = MLP over [u, attended-item, u*attended-item] with dropout(0.5)
    before relu (:265-268)
  * masked-ingredient SSL: from-scratch post-LN Encoder over the masked
    sequence, BCE on sigmoid(pos-neg) at masked positions (:208-232); masking
    itself runs on-device (data/sampling.py ssl_mask_ingredients)
  * sum-form BPR + per-tensor L2 regs (:305-316)

Deviation from the reference, on purpose: component-level attention scores
are stacked per sample ([B, 4]); the reference's `.view(b, -1)` on the
concatenated [4B, 1] tensor interleaves scores across samples
(schgn.py:198-200), which is an indexing slip, not a design choice.
Config flag `schgn_faithful_interleave: True` reproduces the reference's
exact mixing (component-major flatten of the [B, 4] score matrix re-read
row-major as [B, 4]) so the fix can be A/B'd against the reference
(parity_check.py --set schgn_faithful_interleave=True).
"""

import jax
import jax.numpy as jnp
import numpy as np

from foodrec_tpu.common.init import truncated_normal
from foodrec_tpu.common.loss import l2_loss
from foodrec_tpu.common.module import bert_encoder_apply, bert_encoder_params, dropout
from foodrec_tpu.data.sampling import ssl_mask_ingredients
from foodrec_tpu.models import register
from foodrec_tpu.models.base import GeneralRecommender
from foodrec_tpu.ops.graph import gcn_conv_adjacency
from foodrec_tpu.ops.spmm import Propagator


def _tn_linear(key, d_in, d_out, w_std, b_std=None, bias=True):
    kw, kb = jax.random.split(key)
    p = {"w": truncated_normal(kw, (d_out, d_in), std=w_std).T}
    if bias:
        p["b"] = truncated_normal(kb, (d_out,), std=b_std or w_std)
    return p


def _torch_default_linear(key, d_in, d_out):
    kw, kb = jax.random.split(key)
    bound_w = 1.0 / np.sqrt(d_in)
    return {"w": jax.random.uniform(kw, (d_out, d_in), minval=-bound_w,
                                    maxval=bound_w).T,
            "b": jax.random.uniform(kb, (d_out,), minval=-bound_w,
                                    maxval=bound_w)}


@register("SCHGN")
class SCHGN(GeneralRecommender):
    # candidate-wise attention is memory-heavy; cap eval user blocks
    eval_batch_cap = 32

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_ingredients = dataset.num_ingredients
        self.n_health = dataset.num_calories_level  # calorie levels (schgn.py:53)
        self.img_size = dataset.image_size
        self.regs = config["regs"]
        self.reg_image = config["reg_image"]
        self.reg_w = config["reg_w"]
        self.reg_g = config["reg_g"]
        self.reg_health = config["reg_health"]
        self.ssl = config["ssl"]
        self.use_ssl = bool(config["SCHGN_ssl"])
        self.nhead = config["num_attention_heads"]
        self.n_enc_layers = config["num_hidden_layers"]
        self.inner_size = config["inner_size"]
        self.hidden_dropout = config["hidden_dropout_prob"]
        self.attn_dropout = config["attention_probs_dropout_prob"]
        self.hidden_act = config["hidden_act"]
        self.masked_p = 0.2  # dataloader.py:17
        # reproduce the reference's `.view(b, -1)` component-score mixing
        # (schgn.py:198-200) instead of the per-sample fix — see module
        # docstring; the scramble depends on the flattened batch size, so
        # eval must block candidates exactly like the comparison harness
        self.faithful_interleave = bool(config["schgn_faithful_interleave"])

        # hetero graph: items->users, ingredients->items, cal->items
        # (schgn.py:139-151); node order users|items|ingredients|cal
        nu, ni, ng = self.n_users, self.n_items, self.n_ingredients
        ur = np.asarray(dataset.uRecipe_triples, dtype=np.int64)
        ri = np.asarray(dataset.rIngre_triples, dtype=np.int64)
        rc = np.asarray(dataset.rCalories_triples, dtype=np.int64)
        src = np.concatenate([ur[:, 1] + nu,            # item -> user
                              ri[:, 1] + nu + ni,       # ingredient -> item
                              rc[:, 1] + nu + ni + ng])  # cal -> item
        dst = np.concatenate([ur[:, 0], ri[:, 0] + nu, rc[:, 0] + nu])
        n_nodes = nu + ni + ng + self.n_health
        self.gcn_prop = self.register_propagator(
            "gcn_prop", Propagator(gcn_conv_adjacency(src, dst, n_nodes),
                                    impl=config["spmm_impl"] or "auto",
                                    compute_dtype=config["spmm_dtype"]))

        dd = self.dd
        self.img = self.register_buffer("img", jnp.asarray(dd.img))
        self.ingre_codes = self.register_buffer(
            "ingre_codes", jnp.asarray(dd.ingre_codes))
        self.ingre_num = self.register_buffer(
            "ingre_num", jnp.asarray(dd.ingre_num))
        cal = dd.cal_level
        if cal is None:
            cal = np.zeros(self.n_items, np.int32)
        self.cal_level = self.register_buffer("cal_level", jnp.asarray(cal))

    def init_params(self, key):
        d = self.embedding_size
        ks = jax.random.split(key, 16)
        return {
            "user_embed": truncated_normal(ks[0], (self.n_users, d), std=0.01),
            "item_embed": truncated_normal(ks[1], (self.n_items, d), std=0.01),
            "ingre_embed_first": truncated_normal(
                ks[2], (self.n_ingredients, d), std=0.01),
            "ingre_embed_mask": truncated_normal(ks[3], (1, d), std=0.01),
            "health_embed": truncated_normal(ks[4], (self.n_health, d),
                                             std=0.01),
            "gcn": _tn_linear(ks[5], d, d, np.sqrt(2.0 / (d + d))),
            "img_trans": _tn_linear(ks[6], self.img_size, d,
                                    np.sqrt(2.0 / (self.img_size + d))),
            "W_att_ingre": _tn_linear(ks[7], 3 * d, d,
                                      np.sqrt(2.0 / (4 * d)),
                                      np.sqrt(2.0 / (2 * d))),
            "h_att_ingre": {"w": jnp.ones((d, 1))},
            "W_att_comp": _tn_linear(ks[8], 2 * d, d,
                                     np.sqrt(2.0 / (3 * d)),
                                     np.sqrt(2.0 / (2 * d))),
            "h_att_comp": {"w": jnp.ones((d, 1))},
            "W_concat": _tn_linear(ks[9], 3 * d, d,
                                   np.sqrt(2.0 / (4 * d)),
                                   np.sqrt(2.0 / (2 * d))),
            "output_mlp": _tn_linear(ks[10], d, 1, np.sqrt(2.0 / (2 * d)),
                                     bias=False),
            "mip_norm": _torch_default_linear(ks[11], d, d),
            "encoder": bert_encoder_params(ks[12], d, self.inner_size,
                                           self.n_enc_layers),
        }

    # ------------------------------------------------------------------ core
    def _gcn(self, params):
        """One GCNConv+tanh over the hetero graph (schgn.py:29-41, 247-254).
        Returns split per-type tables plus the [gcn_ingre; 0; mask] table."""
        x = jnp.concatenate([params["user_embed"], params["item_embed"],
                             params["ingre_embed_first"],
                             params["health_embed"]], axis=0)
        y = self.gcn_prop(x)
        y = jnp.tanh(y @ params["gcn"]["w"] + params["gcn"]["b"])
        nu, ni, ng = self.n_users, self.n_items, self.n_ingredients
        u, i, g, h = (y[:nu], y[nu:nu + ni], y[nu + ni:nu + ni + ng],
                      y[nu + ni + ng:])
        zero = jnp.zeros((1, x.shape[1]))
        g_full = jnp.concatenate([g, zero, params["ingre_embed_mask"]], axis=0)
        return u, i, g_full, h

    def _ingre_table(self, params, with_mask=True):
        zero = jnp.zeros((1, self.embedding_size))
        parts = [params["ingre_embed_first"], zero]
        if with_mask:
            parts.append(params["ingre_embed_mask"])
        return jnp.concatenate(parts, axis=0)

    def _attention_ingredient_level(self, params, ingre_emb, u_emb, img_emb,
                                    ingre_num):
        """(schgn.py:159-184): additive attention over the 20 ingredient
        slots conditioned on user+image; positions >= ingre_num masked."""
        n = ingre_emb.shape[-2]
        tile_u = jnp.broadcast_to(u_emb[..., None, :],
                                  ingre_emb.shape[:-1] + (u_emb.shape[-1],))
        tile_img = jnp.broadcast_to(img_emb[..., None, :],
                                    ingre_emb.shape[:-1] + (img_emb.shape[-1],))
        concat_v = jnp.concatenate([ingre_emb, tile_u, tile_img], axis=-1)
        h = jnp.tanh(concat_v @ params["W_att_ingre"]["w"]
                     + params["W_att_ingre"]["b"])
        a = (h @ params["h_att_ingre"]["w"])[..., 0]
        mask = jnp.arange(n) >= ingre_num[..., None]
        a = jnp.where(mask, a - 1e12, a)
        w = jax.nn.softmax(a, axis=-1)
        return jnp.sum(w[..., None] * ingre_emb, axis=-2)

    def _attention_component_level(self, params, u_emb, i_emb, ingre_att,
                                   img_emb, hl_emb):
        """(schgn.py:186-206) — per-sample score stack, see module docstring."""
        comps = jnp.stack([i_emb, ingre_att, img_emb, hl_emb], axis=-2)
        u_tile = jnp.broadcast_to(u_emb[..., None, :],
                                  comps.shape[:-1] + (u_emb.shape[-1],))
        cp = jnp.concatenate([u_tile, comps], axis=-1)
        h = jnp.tanh(cp @ params["W_att_comp"]["w"]
                     + params["W_att_comp"]["b"])
        scores = (h @ params["h_att_comp"]["w"])[..., 0]
        if self.faithful_interleave:
            # reference schgn.py:195-200: scores are computed on the [4B, 2d]
            # component-major concat and `.view(b, -1)`'d — row i of the
            # softmax input is flat[4i:4i+4] of the COMPONENT-major flat
            # vector, i.e. scores of other samples/components. Replicate:
            # sample-major [B, 4] -> transpose-flatten -> re-read as [B, 4].
            lead = scores.shape[:-1]
            b = int(np.prod(lead)) if lead else 1
            flat = scores.reshape(b, 4).T.reshape(-1)
            scores = flat.reshape(b, 4).reshape(lead + (4,))
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.sum(w[..., None] * comps, axis=-2)

    def _score(self, params, gcn_tables, users, items, is_training, key=None):
        """compute_score (schgn.py:234-268) for arbitrary leading batch dims:
        users/items broadcastable int arrays of the same shape."""
        u_gcn, i_gcn, g_gcn, h_gcn = gcn_tables
        ingre = self.ingre_codes[items]
        ingre_num = self.ingre_num[items]
        hl = self.cal_level[items]
        ingre_table = self._ingre_table(params)

        u_emb = params["user_embed"][users] + u_gcn[users]
        i_emb = params["item_embed"][items] + i_gcn[items]
        ingre_emb = ingre_table[ingre] + g_gcn[ingre]
        hl_emb = params["health_embed"][hl] + h_gcn[hl]
        img_emb = (self.img[items] @ params["img_trans"]["w"]
                   + params["img_trans"]["b"])

        ingre_att = self._attention_ingredient_level(
            params, ingre_emb, u_emb, img_emb, ingre_num)
        item_att = self._attention_component_level(
            params, u_emb, i_emb, ingre_att, img_emb, hl_emb)
        ui = jnp.concatenate([u_emb, item_att, u_emb * item_att], axis=-1)
        hidden = ui @ params["W_concat"]["w"] + params["W_concat"]["b"]
        if is_training and key is not None:
            hidden = dropout(key, hidden, 0.5, False)
        mlp_out = jax.nn.relu(hidden)
        return (mlp_out @ params["output_mlp"]["w"])[..., 0]

    # ------------------------------------------------------------------- SSL
    def _ssl_loss(self, params, g_gcn_table, items, key):
        """Masked-ingredient prediction (schgn.py:208-232): on-device mask
        sampling, then the deterministic scoring part (split out so the
        torch-parity test can drive identical sequences through both sides)."""
        codes = self.ingre_codes[items]
        num = self.ingre_num[items]
        masked_seq, pos_seq, neg_seq = ssl_mask_ingredients(
            key, codes, num, self.n_ingredients, masked_p=self.masked_p)
        return self._ssl_loss_from_seqs(params, g_gcn_table, masked_seq,
                                        pos_seq, neg_seq, key)

    def _ssl_loss_from_seqs(self, params, g_gcn_table, masked_seq, pos_seq,
                            neg_seq, key):
        ingre_emb = g_gcn_table[masked_seq]
        attn_mask = ((masked_seq == self.n_ingredients).astype(jnp.float32)
                     * -1e8)[:, None, None, :]
        k_enc, _ = jax.random.split(key)
        enc = bert_encoder_apply(
            params["encoder"], ingre_emb, attn_mask, self.nhead,
            act=self.hidden_act, hidden_dropout=self.hidden_dropout,
            attn_dropout=self.attn_dropout, key=k_enc, deterministic=False)

        ingre_table = self._ingre_table(params)
        mip = enc @ params["mip_norm"]["w"] + params["mip_norm"]["b"]

        def score(target):
            return jax.nn.sigmoid(jnp.sum(mip * ingre_table[target], axis=-1))

        dist = jax.nn.sigmoid(score(pos_seq) - score(neg_seq))
        bce = -jnp.clip(jnp.log(dist), -100.0)   # BCE vs ones
        mip_mask = (masked_seq == self.n_ingredients + 1).astype(jnp.float32)
        return jnp.sum(bce * mip_mask)

    # ------------------------------------------------------------------ loss
    def calculate_loss(self, params, batch):
        user = batch["u_id"]
        pos_item = batch["pos_i_id"]
        neg_item = batch["neg_i_id"]
        w = batch.get("weight")
        key = batch.get("key", jax.random.PRNGKey(0))
        k_pos, k_neg, k_ssl = jax.random.split(key, 3)
        # deterministic mode for the gradient-certificate / lockstep
        # harnesses: no score dropout (mirrors the reference called with
        # is_training=False, schgn.py:267) and externally provided SSL
        # sequences instead of the on-device mask stream
        if batch.get("deterministic"):
            k_pos = k_neg = None

        gcn_tables = self._gcn(params)
        pos_scores = self._score(params, gcn_tables, user, pos_item, True,
                                 k_pos)
        neg_scores = self._score(params, gcn_tables, user, neg_item, True,
                                 k_neg)

        diff = jax.nn.log_sigmoid(pos_scores - neg_scores)
        if w is not None:
            diff = diff * w
        bpr = -jnp.sum(diff)

        ingre_table = self._ingre_table(params)
        reg = self.regs * (
            l2_loss(params["user_embed"][user], weight=w)
            + l2_loss(params["item_embed"][pos_item], weight=w)
            + l2_loss(params["item_embed"][neg_item], weight=w)
            + l2_loss(ingre_table[self.ingre_codes[pos_item]], weight=w)
            + l2_loss(ingre_table[self.ingre_codes[neg_item]], weight=w)
        ) * 2.0  # reference l2_loss is sum(t**2); ours halves — undo
        reg = reg + self.reg_health * 2.0 * (
            l2_loss(params["health_embed"][self.cal_level[pos_item]], weight=w)
            + l2_loss(params["health_embed"][self.cal_level[neg_item]],
                      weight=w))
        reg = reg + self.reg_image * jnp.sum(params["img_trans"]["w"] ** 2)
        reg = reg + self.reg_w * (jnp.sum(params["W_concat"]["w"] ** 2)
                                  + jnp.sum(params["output_mlp"]["w"] ** 2))
        reg = reg + self.reg_g * jnp.sum(params["gcn"]["w"] ** 2)

        if self.use_ssl:
            if "ssl_masked_seq" in batch:
                ssl = self.ssl * self._ssl_loss_from_seqs(
                    params, gcn_tables[2], batch["ssl_masked_seq"],
                    batch["ssl_pos_seq"], batch["ssl_neg_seq"], k_ssl)
            else:
                ssl = self.ssl * self._ssl_loss(params, gcn_tables[2],
                                                pos_item, k_ssl)
        else:
            ssl = jnp.float32(0.0)
        return bpr, reg, ssl

    # ------------------------------------------------------------------ eval
    def forward(self, params):
        # SCHGN has no propagated user/item dot-product form; eval_cache holds
        # the gcn tables and scoring happens per candidate
        return self._gcn(params)

    def eval_cache(self, params):
        return self._gcn(params)

    def score_from_cache(self, params, cache, users, cand):
        users_b = jnp.broadcast_to(users[:, None], cand.shape)
        return self._score(params, cache, users_b, cand, False)

    def full_sort_predict(self, params, user):
        """Score one user against the whole catalog (schgn.py:318-345)."""
        cache = self._gcn(params)
        items = jnp.arange(self.n_items)
        users_b = jnp.broadcast_to(user[..., None], user.shape + (self.n_items,))
        return self._score(params, cache, users_b,
                           jnp.broadcast_to(items, users_b.shape), False)

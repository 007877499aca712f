# coding: utf-8
"""Attention / transformer building blocks, pure JAX.

Two families, matching the two encoders in the reference:

  * `transformer_encoder_*`: torch nn.TransformerEncoder parity (post-LN,
    MultiheadAttention with key-padding mask) — used by CIKM_Model's
    ingredient encoder (cikm_model.py:27-32, 228-238). Sequences are
    [B, L, D] (batch-first; the reference permutes to seq-first only because
    torch requires it).
  * `target_attention_*`: the custom chunked multi-head attention with
    optional per-head LayerNorm on Q/K and padding mask
    (cikm_model.py:311-369).

All ops are MXU-shaped: seq len <= 20, so attention is plain batched matmul —
no flash/blockwise machinery needed (SURVEY.md §5.7).
"""

import jax
import jax.numpy as jnp

from foodrec_tpu.common.init import xavier_uniform

import functools as _functools

ACT = {
    "relu": jax.nn.relu,
    # torch F.gelu and the reference's erf formula (module.py:13-22) are the
    # EXACT gelu; jax.nn.gelu defaults to the tanh approximation
    "gelu": _functools.partial(jax.nn.gelu, approximate=False),
    "swish": jax.nn.silu,
}

def _acc_dtype(x):
    """MXU accumulation dtype: f32 for f32/bf16 inputs, f64 under x64 (the
    gradient-certificate harness runs these modules in float64; a hard f32
    preferred_element_type would silently downcast it)."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def layer_norm(x, gamma, beta, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return gamma * (x - mu) * jax.lax.rsqrt(var + eps) + beta


def dropout(key, x, rate, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# torch nn.TransformerEncoder parity
# ---------------------------------------------------------------------------


def transformer_encoder_params(key, d_model, dim_ff, n_layers):
    """Params as re-initialized by the reference's
    `apply(xavier_uniform_initialization)` pass (cikm_model.py:81): every
    Linear gets xavier_uniform weight + zero bias; in_proj keeps torch's own
    xavier_uniform; LayerNorms are (1, 0)."""
    layers = []
    for _ in range(n_layers):
        ks = jax.random.split(key, 5)
        key = ks[-1]
        layers.append({
            "in_proj_w": xavier_uniform(ks[0], (3 * d_model, d_model)).T,
            "in_proj_b": jnp.zeros((3 * d_model,)),
            "out_proj_w": xavier_uniform(ks[1], (d_model, d_model)).T,
            "out_proj_b": jnp.zeros((d_model,)),
            "ff1_w": xavier_uniform(ks[2], (dim_ff, d_model)).T,
            "ff1_b": jnp.zeros((dim_ff,)),
            "ff2_w": xavier_uniform(ks[3], (d_model, dim_ff)).T,
            "ff2_b": jnp.zeros((d_model,)),
            "ln1_g": jnp.ones((d_model,)), "ln1_b": jnp.zeros((d_model,)),
            "ln2_g": jnp.ones((d_model,)), "ln2_b": jnp.zeros((d_model,)),
        })
    return layers


def _mha(p, x, nhead, pad_mask, drop_rate, key, deterministic):
    """torch MultiheadAttention forward: x [B, L, D], pad_mask [B, L] True at
    padding. Softmax over keys with -inf at padded keys."""
    b, L, d = x.shape
    dh = d // nhead
    qkv = x @ p["in_proj_w"] + p["in_proj_b"]          # [B, L, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, L, nhead, dh).transpose(0, 2, 1, 3)  # [B,H,L,dh]

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=_acc_dtype(q)) / jnp.sqrt(dh)
    if pad_mask is not None:
        logits = jnp.where(pad_mask[:, None, None, :], -jnp.inf, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows (a padded query) softmax to nan in torch too; the
    # callers never read padded outputs, but keep them finite for grad safety
    attn = jnp.where(jnp.isnan(attn), 0.0, attn)
    if not deterministic and drop_rate > 0.0:
        key, k_d = jax.random.split(key)
        attn = dropout(k_d, attn, drop_rate, deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=_acc_dtype(q))
    out = out.transpose(0, 2, 1, 3).reshape(b, L, d)
    return out @ p["out_proj_w"] + p["out_proj_b"]


def transformer_encoder_apply(params, x, nhead, pad_mask=None, act="gelu",
                              drop_rate=0.0, key=None, deterministic=True):
    """Post-LN encoder stack (torch default norm_first=False):
    x = LN1(x + Drop(MHA(x))); x = LN2(x + Drop(FF2(Drop(Act(FF1(x))))))."""
    act_fn = ACT[act]
    if key is None:
        key = jax.random.PRNGKey(0)
    for p in params:
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        a = _mha(p, x, nhead, pad_mask, drop_rate, k1, deterministic)
        x = layer_norm(x + dropout(k2, a, drop_rate, deterministic),
                       p["ln1_g"], p["ln1_b"])
        h = act_fn(x @ p["ff1_w"] + p["ff1_b"])
        h = dropout(k3, h, drop_rate, deterministic)
        h = h @ p["ff2_w"] + p["ff2_b"]
        x = layer_norm(x + dropout(k4, h, drop_rate, deterministic),
                       p["ln2_g"], p["ln2_b"])
    return x


# ---------------------------------------------------------------------------
# target attention (cikm_model.py:311-369)
# ---------------------------------------------------------------------------


def target_attention_params(num_split):
    """linear_projection=False in both uses, so only the per-head LayerNorm
    carries parameters (the q/k/v linears exist but are dead weight in the
    reference; we do not materialize them)."""
    return {"ln_g": jnp.ones((num_split,)), "ln_b": jnp.zeros((num_split,))}


def target_attention_apply(p, query, kv, num_head, seq_ids=None,
                           padding_idx=None):
    """query [B, Lq, D], kv [B, Lk, D] -> [B, Lq, D].

    Per-head LN('ln' mode) on Q and K, scaled dot-product, optional key
    padding mask built from seq_ids == padding_idx with the reference's
    additive -2^32+1 trick (cikm_model.py:349-356)."""
    b, lq, d = query.shape
    lk = kv.shape[1]
    dh = d // num_head

    def heads(t, L):
        return t.reshape(b, L, num_head, dh).transpose(0, 2, 1, 3)

    q = heads(query, lq)
    k = heads(kv, lk)
    v = heads(kv, lk)
    q = layer_norm(q, p["ln_g"], p["ln_b"], eps=1e-12)
    k = layer_norm(k, p["ln_g"], p["ln_b"], eps=1e-12)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=_acc_dtype(q)) * (dh ** -0.5)
    if seq_ids is not None:
        pad = (seq_ids == padding_idx)                    # [B, Lk]
        neg = jnp.float32(-(2.0 ** 32) + 1)
        logits = jnp.where(pad[:, None, None, :], neg, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=_acc_dtype(q))
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d), attn


# ---------------------------------------------------------------------------
# from-scratch post-LN encoder with additive attention mask
# (reference: FoodRec/common/module.py:48-194, used by SCHGN's ingredient SSL)
# ---------------------------------------------------------------------------


def bert_encoder_params(key, d_model, inner_size, n_layers, init=None):
    """Per-layer q/k/v/dense + 2-layer FFN + two LayerNorms. The reference
    re-inits every Linear with truncated_normal(std=0.01) and zero bias
    (schgn.py:130-138); pass `init` to override."""
    from foodrec_tpu.common.init import truncated_normal

    if init is None:
        def init(k, shape, dtype=jnp.float32):
            return truncated_normal(k, shape, dtype, std=0.01)

    layers = []
    for _ in range(n_layers):
        ks = jax.random.split(key, 7)
        key = ks[-1]
        layers.append({
            "q_w": init(ks[0], (d_model, d_model)).T, "q_b": jnp.zeros((d_model,)),
            "k_w": init(ks[1], (d_model, d_model)).T, "k_b": jnp.zeros((d_model,)),
            "v_w": init(ks[2], (d_model, d_model)).T, "v_b": jnp.zeros((d_model,)),
            "dense_w": init(ks[3], (d_model, d_model)).T,
            "dense_b": jnp.zeros((d_model,)),
            "ff1_w": init(ks[4], (inner_size, d_model)).T,
            "ff1_b": jnp.zeros((inner_size,)),
            "ff2_w": init(ks[5], (d_model, inner_size)).T,
            "ff2_b": jnp.zeros((d_model,)),
            "ln1_g": jnp.ones((d_model,)), "ln1_b": jnp.zeros((d_model,)),
            "ln2_g": jnp.ones((d_model,)), "ln2_b": jnp.zeros((d_model,)),
        })
    return layers


def bert_encoder_apply(params, x, attn_mask, nhead, act="gelu",
                       hidden_dropout=0.0, attn_dropout=0.0, key=None,
                       deterministic=True, layer_norm_eps=1e-12):
    """x [B, L, D]; attn_mask is *additive* [B, 1, 1, L] (0 keep / -1e8 drop,
    module.py:96-101). Post-LN with residuals inside both sublayers."""
    act_fn = ACT[act]
    if key is None:
        key = jax.random.PRNGKey(0)
    b, L, d = x.shape
    dh = d // nhead
    for p in params:
        key, k1, k2, k3 = jax.random.split(key, 4)

        def heads(t):
            return t.reshape(b, L, nhead, dh).transpose(0, 2, 1, 3)

        q = heads(x @ p["q_w"] + p["q_b"])
        k = heads(x @ p["k_w"] + p["k_b"])
        v = heads(x @ p["v_w"] + p["v_b"])
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=_acc_dtype(q)) / jnp.sqrt(dh)
        logits = logits + attn_mask
        attn = jax.nn.softmax(logits, axis=-1)
        attn = dropout(k1, attn, attn_dropout, deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=_acc_dtype(q))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, L, d)
        h = ctx @ p["dense_w"] + p["dense_b"]
        h = dropout(k2, h, hidden_dropout, deterministic)
        x = layer_norm(h + x, p["ln1_g"], p["ln1_b"], eps=layer_norm_eps)

        h = act_fn(x @ p["ff1_w"] + p["ff1_b"])
        h = h @ p["ff2_w"] + p["ff2_b"]
        h = dropout(k3, h, hidden_dropout, deterministic)
        x = layer_norm(h + x, p["ln2_g"], p["ln2_b"], eps=layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# generic MLP stack (reference: FoodRec/common/module.py:197-263)
# ---------------------------------------------------------------------------


def mlp_layers_params(key, layers, init_method=None):
    """[Dropout, Linear, ReLU] per (in, out) pair. init_method='norm' ->
    N(0, 0.01) weights / zero bias (module.py:246-252); default keeps torch
    Linear init."""
    from foodrec_tpu.common.init import kaiming_uniform_linear

    params = []
    for d_in, d_out in zip(layers[:-1], layers[1:]):
        kw, kb, key = jax.random.split(key, 3)
        if init_method == "norm":
            w = 0.01 * jax.random.normal(kw, (d_out, d_in))
            b = jnp.zeros((d_out,))
        else:
            w = kaiming_uniform_linear(kw, (d_out, d_in))
            bound = 1.0 / jnp.sqrt(d_in)
            b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
        params.append({"w": w.T, "b": b})
    return params


def mlp_layers_apply(params, x, drop_rate=0.0, activation="relu",
                     last_activation=True, key=None, deterministic=True):
    act = {"relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid,
           "tanh": jnp.tanh, "leakyrelu": jax.nn.leaky_relu,
           "none": lambda v: v}[activation or "none"]
    if key is None:
        key = jax.random.PRNGKey(0)
    for i, p in enumerate(params):
        key, k = jax.random.split(key)
        x = dropout(k, x, drop_rate, deterministic)
        x = x @ p["w"] + p["b"]
        if last_activation or i < len(params) - 1:
            x = act(x)
    return x


def mlp_2layer_params(key, d_in, d_hidden, d_out):
    """nn.Sequential(Linear, ReLU, Linear) re-initialized to
    xavier_uniform/zero-bias by the model's apply pass."""
    from foodrec_tpu.common.init import linear_params

    k1, k2 = jax.random.split(key)
    return {"l1": linear_params(k1, d_in, d_hidden, init=xavier_uniform),
            "l2": linear_params(k2, d_hidden, d_out, init=xavier_uniform)}


def mlp_2layer_apply(p, x):
    from foodrec_tpu.common.init import linear_apply

    return linear_apply(p["l2"], jax.nn.relu(linear_apply(p["l1"], x)))

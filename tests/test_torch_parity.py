"""Numerical parity of our JAX blocks against the torch reference modules
with IDENTICAL weights — the strongest evidence that the rebuild computes the
same functions (losses, transformer encoder, from-scratch Encoder, target
attention)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys  # noqa: E402

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

D, H, FF, B, L = 32, 2, 64, 5, 7


def test_losses_match_torch_reference():
    from FoodRec.common.loss import BPRLoss, EmbLoss, L2Loss

    from foodrec_tpu.common.loss import bpr_loss, emb_loss, l2_loss

    rng = np.random.default_rng(0)
    pos = rng.normal(size=12).astype(np.float32)
    neg = rng.normal(size=12).astype(np.float32)
    ref = float(BPRLoss()(torch.tensor(pos), torch.tensor(neg)))
    ours = float(bpr_loss(jnp.asarray(pos), jnp.asarray(neg)))
    assert ours == pytest.approx(ref, rel=1e-5)

    e1 = rng.normal(size=(12, 8)).astype(np.float32)
    e2 = rng.normal(size=(12, 8)).astype(np.float32)
    ref = float(EmbLoss()(torch.tensor(e1), torch.tensor(e2)))
    ours = float(emb_loss(jnp.asarray(e1), jnp.asarray(e2)))
    assert ours == pytest.approx(ref, rel=1e-5)

    ref = float(L2Loss()(torch.tensor(e1), torch.tensor(e2)))
    ours = float(l2_loss(jnp.asarray(e1), jnp.asarray(e2)))
    assert ours == pytest.approx(ref, rel=1e-5)


def _t(x):
    return torch.tensor(np.asarray(x))


def test_transformer_encoder_matches_torch():
    """torch nn.TransformerEncoder (CIKM's ingredient encoder,
    cikm_model.py:27-32) vs transformer_encoder_apply, weights copied."""
    from foodrec_tpu.common.module import transformer_encoder_apply

    torch.manual_seed(0)
    layer = torch.nn.TransformerEncoderLayer(
        d_model=D, nhead=H, dim_feedforward=FF, dropout=0.0,
        activation="gelu")
    enc = torch.nn.TransformerEncoder(layer, num_layers=2).eval()

    params = []
    for tl in enc.layers:
        params.append({
            "in_proj_w": jnp.asarray(tl.self_attn.in_proj_weight.detach().numpy().T),
            "in_proj_b": jnp.asarray(tl.self_attn.in_proj_bias.detach().numpy()),
            "out_proj_w": jnp.asarray(tl.self_attn.out_proj.weight.detach().numpy().T),
            "out_proj_b": jnp.asarray(tl.self_attn.out_proj.bias.detach().numpy()),
            "ff1_w": jnp.asarray(tl.linear1.weight.detach().numpy().T),
            "ff1_b": jnp.asarray(tl.linear1.bias.detach().numpy()),
            "ff2_w": jnp.asarray(tl.linear2.weight.detach().numpy().T),
            "ff2_b": jnp.asarray(tl.linear2.bias.detach().numpy()),
            "ln1_g": jnp.asarray(tl.norm1.weight.detach().numpy()),
            "ln1_b": jnp.asarray(tl.norm1.bias.detach().numpy()),
            "ln2_g": jnp.asarray(tl.norm2.weight.detach().numpy()),
            "ln2_b": jnp.asarray(tl.norm2.bias.detach().numpy()),
        })

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    pad = np.zeros((B, L), dtype=bool)
    pad[:, -2:] = True  # last two positions padded (but not all)

    with torch.no_grad():
        ref = enc(_t(x).permute(1, 0, 2),
                  src_key_padding_mask=_t(pad)).permute(1, 0, 2).numpy()
    ours = np.asarray(transformer_encoder_apply(
        params, jnp.asarray(x), H, pad_mask=jnp.asarray(pad), act="gelu",
        deterministic=True))
    # padded positions' outputs are junk in both; compare real positions
    np.testing.assert_allclose(ours[:, :-2], ref[:, :-2], rtol=2e-4,
                               atol=2e-5)


def test_bert_encoder_matches_reference_module():
    """The from-scratch Encoder (FoodRec/common/module.py:48-194, SCHGN's
    SSL tower) vs bert_encoder_apply, weights copied."""
    from FoodRec.common.module import Encoder

    from foodrec_tpu.common.module import bert_encoder_apply

    torch.manual_seed(2)
    enc = Encoder(n_layers=2, n_heads=H, hidden_size=D, inner_size=FF,
                  hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
                  hidden_act="gelu", layer_norm_eps=1e-12).eval()
    # deepcopied layers share init; randomize so the test is non-degenerate
    for p in enc.parameters():
        p.data.normal_(0, 0.05)

    params = []
    for tl in enc.layer:
        a, i = tl.attention, tl.intermediate
        params.append({
            "q_w": jnp.asarray(a.query.weight.detach().numpy().T),
            "q_b": jnp.asarray(a.query.bias.detach().numpy()),
            "k_w": jnp.asarray(a.key.weight.detach().numpy().T),
            "k_b": jnp.asarray(a.key.bias.detach().numpy()),
            "v_w": jnp.asarray(a.value.weight.detach().numpy().T),
            "v_b": jnp.asarray(a.value.bias.detach().numpy()),
            "dense_w": jnp.asarray(a.dense.weight.detach().numpy().T),
            "dense_b": jnp.asarray(a.dense.bias.detach().numpy()),
            "ln1_g": jnp.asarray(a.LayerNorm.weight.detach().numpy()),
            "ln1_b": jnp.asarray(a.LayerNorm.bias.detach().numpy()),
            "ff1_w": jnp.asarray(i.dense_1.weight.detach().numpy().T),
            "ff1_b": jnp.asarray(i.dense_1.bias.detach().numpy()),
            "ff2_w": jnp.asarray(i.dense_2.weight.detach().numpy().T),
            "ff2_b": jnp.asarray(i.dense_2.bias.detach().numpy()),
            "ln2_g": jnp.asarray(i.LayerNorm.weight.detach().numpy()),
            "ln2_b": jnp.asarray(i.LayerNorm.bias.detach().numpy()),
        })

    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    mask_bool = rng.random((B, L)) < 0.3
    mask_bool[:, 0] = False  # keep at least one unmasked key per row
    add_mask = (mask_bool.astype(np.float32) * -1e8)[:, None, None, :]

    with torch.no_grad():
        ref = enc(_t(x), _t(add_mask),
                  output_all_encoded_layers=False)[-1].numpy()
    ours = np.asarray(bert_encoder_apply(
        params, jnp.asarray(x), jnp.asarray(add_mask), H, act="gelu",
        deterministic=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_target_attention_matches_reference():
    """target_attention_layer (cikm_model.py:311-369) vs
    target_attention_apply, LN weights copied (linear_projection=False)."""
    from FoodRec.models.cikm_model import target_attention_layer

    from foodrec_tpu.common.module import target_attention_apply

    pad_idx = 99
    torch.manual_seed(4)
    ta = target_attention_layer(D, D, H, linear_projection=False,
                                atten_mode="ln", padding_idx=pad_idx).eval()
    ta.ln.weight.data.normal_(1.0, 0.05)
    ta.ln.bias.data.normal_(0.0, 0.05)
    params = {"ln_g": jnp.asarray(ta.ln.weight.detach().numpy()),
              "ln_b": jnp.asarray(ta.ln.bias.detach().numpy())}

    rng = np.random.default_rng(5)
    q = rng.normal(size=(B, 2, D)).astype(np.float32)
    kv = rng.normal(size=(B, L, D)).astype(np.float32)
    seq_ids = rng.integers(0, 50, size=(B, L))
    seq_ids[:, -2:] = pad_idx

    with torch.no_grad():
        ref, _ = ta(_t(q), _t(kv), _t(seq_ids))
    ours, _ = target_attention_apply(params, jnp.asarray(q), jnp.asarray(kv),
                                     H, seq_ids=jnp.asarray(seq_ids),
                                     padding_idx=pad_idx)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4,
                               atol=2e-5)

    # unmasked call (the ingre->mm direction, cikm_model.py:246)
    with torch.no_grad():
        ref2, _ = ta(_t(kv), _t(q))
    ours2, _ = target_attention_apply(params, jnp.asarray(kv),
                                      jnp.asarray(q), H)
    np.testing.assert_allclose(np.asarray(ours2), ref2.numpy(), rtol=2e-4,
                               atol=2e-5)

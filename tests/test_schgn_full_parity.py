"""Full-model SCHGN math parity against the torch reference at identical
parameters: the score path (hetero GCNConv + both attention levels + MLP,
schgn.py:234-268) and the masked-ingredient SSL loss (schgn.py:208-232) with
identical mask sequences driven through both sides.

Motivation (VERDICT r2 weak #1/#3): SCHGN's best-upon-valid delta was +2.24%
on one seed, and the round-3 faithful-interleave A/B shows the `.view(b,-1)`
interleave fix is NOT the driver (ours-faithful converges to the same NDCG as
ours-fixed). If this test holds, the model math is identical and the residual
delta is optimization dynamics / seed scatter, bounded by the multi-seed
campaign.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.conftest import make_config  # noqa: E402

# the encoder's dropouts are configurable on both sides; the score-path
# comparison runs is_training=False so its hardcoded p=0.5 dropout
# (schgn.py:268) is off on both sides too. faithful_interleave reproduces
# the reference's `.view(b,-1)` component-score mixing (schgn.py:198-200) —
# the ONE documented deviation of our default mode — so identical params
# must give bitwise-close scores.
OV = {"hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
      "schgn_faithful_interleave": True}


def _build_reference(synth_root):
    root, meta = synth_root
    data_path = root.rsplit("/Synth", 1)[0] + "/"
    sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    os.chdir("/root/reference/FoodRec")
    try:
        from parity_check import (install_torch_geometric_stub,
                                  patch_scipy_dok)

        patch_scipy_dok()
        install_torch_geometric_stub()

        from FoodRec.utils.configurator import Config

        config = Config(model="SCHGN", dataset="Synth",
                        config_dict={"gpu_id": 0, "use_gpu": False,
                                     "data_path": data_path,
                                     "neg_sample_num": meta["neg_num"],
                                     **OV},
                        mg=False)
        base = data_path + "Synth/processed_dataset/"
        config["interaction_data_path"] = base
        config["graph_data_path"] = base + "graph_edge/"
        config["ingre_data_path"] = base

        from FoodRec.utils.dataset import FoodData

        torch.manual_seed(7)
        dataset = FoodData(config)
        from FoodRec.models.schgn import SCHGN

        model = SCHGN(config, dataset)
        return config, dataset, model
    finally:
        os.chdir(cwd)


def _copy_params(ref):
    """torch SCHGN state -> our params pytree (models/schgn.py layout)."""
    def a(t):
        return jnp.asarray(t.detach().numpy())

    def lin(mod, bias=True):
        p = {"w": a(mod.weight).T}
        if bias:
            p["b"] = a(mod.bias)
        return p

    enc = []
    for tl in ref.ingre_encoder.layer:
        att, inter = tl.attention, tl.intermediate
        enc.append({
            "q_w": a(att.query.weight).T, "q_b": a(att.query.bias),
            "k_w": a(att.key.weight).T, "k_b": a(att.key.bias),
            "v_w": a(att.value.weight).T, "v_b": a(att.value.bias),
            "dense_w": a(att.dense.weight).T, "dense_b": a(att.dense.bias),
            "ff1_w": a(inter.dense_1.weight).T, "ff1_b": a(inter.dense_1.bias),
            "ff2_w": a(inter.dense_2.weight).T, "ff2_b": a(inter.dense_2.bias),
            "ln1_g": a(att.LayerNorm.weight), "ln1_b": a(att.LayerNorm.bias),
            "ln2_g": a(inter.LayerNorm.weight),
            "ln2_b": a(inter.LayerNorm.bias),
        })
    return {
        "user_embed": a(ref.user_embed),
        "item_embed": a(ref.item_embed),
        "ingre_embed_first": a(ref.ingre_embed_first),
        "ingre_embed_mask": a(ref.ingre_embed_mask),
        "health_embed": a(ref.health_embed),
        "gcn": {"w": a(ref.new_gcn.conv1.lin.weight).T,
                "b": a(ref.new_gcn.conv1.bias)},
        "img_trans": lin(ref.img_trans),
        "W_att_ingre": lin(ref.W_att_ingre),
        "h_att_ingre": {"w": a(ref.h_att_ingre.weight).T},
        "W_att_comp": lin(ref.W_att_comp),
        "h_att_comp": {"w": a(ref.h_att_comp.weight).T},
        "W_concat": lin(ref.W_concat),
        "output_mlp": {"w": a(ref.output_mlp.weight).T},
        "mip_norm": lin(ref.mip_norm),
        "encoder": enc,
    }


@pytest.fixture(scope="module")
def both_models(synth_root):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.models import get_model

    ref_config, ref_dataset, ref_model = _build_reference(synth_root)

    cfg, meta = make_config(synth_root, model="SCHGN", overrides=OV)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    ours = get_model("SCHGN")(cfg, data)

    params = _copy_params(ref_model)
    init = ours.init_params(jax.random.PRNGKey(0))
    assert jax.tree.map(lambda x: x.shape, params) == \
        jax.tree.map(lambda x: x.shape, init)
    return ref_dataset, ref_model, data, ours, params


def _ref_batch_tensors(ref_dataset, items):
    codes = np.asarray(ref_dataset.ingredientCodeDict, dtype=np.int64)[items]
    nums = np.asarray(ref_dataset.ingredientNum, dtype=np.int64)[items]
    img = np.asarray(ref_dataset.embImage, dtype=np.float32)[items]
    cal = np.asarray([ref_dataset.cal_level[i] for i in items],
                     dtype=np.int64)
    return (torch.as_tensor(codes), torch.as_tensor(nums),
            torch.as_tensor(img), torch.as_tensor(cal))


def test_schgn_score_path_matches_torch(both_models):
    """compute_score at is_training=False: hetero GCN + ingredient-level +
    component-level attention + concat MLP, identical inputs/params."""
    ref_dataset, ref_model, data, ours, params = both_models

    rng = np.random.default_rng(5)
    b = 48
    u = rng.integers(0, data.num_users, size=b)
    it = rng.integers(0, data.num_items, size=b)

    codes, nums, img, cal = _ref_batch_tensors(ref_dataset, it)
    ingre_embedding = torch.cat([ref_model.ingre_embed_first,
                                 ref_model.ingre_embed_second,
                                 ref_model.ingre_embed_mask], dim=0)
    with torch.no_grad():
        ref_score = ref_model.compute_score(
            torch.as_tensor(u), torch.as_tensor(it), codes, nums, img, cal,
            False, ref_model.g2i_edges, ref_model.i2u_edges,
            ingre_embedding)[0].numpy()

    gcn_tables = ours._gcn(params)
    our_score = np.asarray(ours._score(
        params, gcn_tables, jnp.asarray(u, jnp.int32),
        jnp.asarray(it, jnp.int32), False))

    np.testing.assert_allclose(our_score, ref_score, rtol=2e-4, atol=2e-5)


def test_schgn_ssl_loss_matches_torch(both_models):
    """compute_ssl_loss with IDENTICAL mask sequences on both sides
    (schgn.py:208-232): transformer encoder + mip scoring + masked BCE."""
    ref_dataset, ref_model, data, ours, params = both_models

    rng = np.random.default_rng(11)
    b = 24
    it = rng.integers(0, data.num_items, size=b)
    ng = data.num_ingredients

    codes = np.asarray(ref_dataset.ingredientCodeDict, dtype=np.int64)[it]
    nums = np.asarray(ref_dataset.ingredientNum, dtype=np.int64)[it]
    L = codes.shape[1]

    # host-built masked sequences following the dataloader contract
    # (dataloader.py:117-143): mask token ng+1 replaces ~20% of real slots,
    # pad stays ng; pos = original code, neg = a code not in the recipe
    masked = codes.copy()
    pos_seq = codes.copy()
    neg_seq = np.full_like(codes, ng)
    for r in range(b):
        n = int(nums[r])
        for s in range(n):
            if rng.random() < 0.2:
                masked[r, s] = ng + 1
                while True:
                    cand = int(rng.integers(0, ng))
                    if cand not in codes[r, :n]:
                        neg_seq[r, s] = cand
                        break

    ingre_embedding = torch.cat([ref_model.ingre_embed_first,
                                 ref_model.ingre_embed_second,
                                 ref_model.ingre_embed_mask], dim=0)
    with torch.no_grad():
        ref_gcn_tab = ref_model.compute_score(
            torch.as_tensor(np.zeros(1, np.int64)),
            torch.as_tensor(it[:1]), torch.as_tensor(codes[:1]),
            torch.as_tensor(nums[:1]),
            torch.as_tensor(
                np.asarray(ref_dataset.embImage, np.float32)[it[:1]]),
            torch.as_tensor(np.zeros(1, np.int64)), False,
            ref_model.g2i_edges, ref_model.i2u_edges, ingre_embedding)[5]
        ref_ssl = float(ref_model.compute_ssl_loss(
            ingre_embedding, ref_gcn_tab, torch.as_tensor(masked),
            torch.as_tensor(pos_seq), torch.as_tensor(neg_seq)))

    g_gcn_table = ours._gcn(params)[2]
    our_ssl = float(ours._ssl_loss_from_seqs(
        params, g_gcn_table, jnp.asarray(masked, jnp.int32),
        jnp.asarray(pos_seq, jnp.int32), jnp.asarray(neg_seq, jnp.int32),
        jax.random.PRNGKey(0)))

    np.testing.assert_allclose(our_ssl, ref_ssl, rtol=5e-4, atol=1e-5)
    assert ref_ssl > 0.0  # masks actually fired

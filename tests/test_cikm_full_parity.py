"""Full-model CIKM_Model loss parity against the torch reference: every
parameter copied from the torch model into our pytree, one identical batch,
all four loss parts compared (reference cikm_model.py:210-283).

This is the independent check of the round-1 parity claim ("torch CIKM
barely learns at its shipped config"): if the loss surfaces are identical at
identical parameters, any remaining training-curve gap is optimization
dynamics / RNG, not model math.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.conftest import make_config  # noqa: E402


def _build_reference(synth_root):
    root, meta = synth_root
    data_path = root.rsplit("/Synth", 1)[0] + "/"
    sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    os.chdir("/root/reference/FoodRec")
    try:
        from parity_check import patch_scipy_dok

        patch_scipy_dok()

        from FoodRec.utils.configurator import Config

        config = Config(model="CIKM_Model", dataset="Synth",
                        config_dict={"gpu_id": 0, "use_gpu": False,
                                     "data_path": data_path,
                                     "neg_sample_num": meta["neg_num"],
                                     "attention_probs_dropout_prob": 0.0},
                        mg=False)
        base = data_path + "Synth/processed_dataset/"
        config["interaction_data_path"] = base
        config["graph_data_path"] = base + "graph_edge/"
        config["ingre_data_path"] = base

        from FoodRec.utils.dataset import FoodData

        torch.manual_seed(7)
        dataset = FoodData(config)
        from FoodRec.models.cikm_model import CIKM_Model

        model = CIKM_Model(config, dataset)
        return config, dataset, model
    finally:
        os.chdir(cwd)


def _copy_params(ref):
    """torch CIKM_Model state -> our params pytree (cikm_model.py layout)."""
    def a(t):
        return jnp.asarray(t.detach().numpy())

    enc = []
    for tl in ref.ingr_encoder.layers:
        enc.append({
            "in_proj_w": a(tl.self_attn.in_proj_weight).T,
            "in_proj_b": a(tl.self_attn.in_proj_bias),
            "out_proj_w": a(tl.self_attn.out_proj.weight).T,
            "out_proj_b": a(tl.self_attn.out_proj.bias),
            "ff1_w": a(tl.linear1.weight).T,
            "ff1_b": a(tl.linear1.bias),
            "ff2_w": a(tl.linear2.weight).T,
            "ff2_b": a(tl.linear2.bias),
            "ln1_g": a(tl.norm1.weight), "ln1_b": a(tl.norm1.bias),
            "ln2_g": a(tl.norm2.weight), "ln2_b": a(tl.norm2.bias),
        })
    return {
        "user_embedding": a(ref.user_embedding.weight),
        "item_embedding": a(ref.item_embedding.weight),
        "ingre_embedding": a(ref.ingre_embedding.weight),
        "encoder": enc,
        "mm_target_atten": {"ln_g": a(ref.mm_target_atten.ln.weight),
                            "ln_b": a(ref.mm_target_atten.ln.bias)},
        "ingre_target_atten": {"ln_g": a(ref.ingre_target_atten.ln.weight),
                               "ln_b": a(ref.ingre_target_atten.ln.bias)},
        "health_mlp": {"l1": {"w": a(ref.health_mlp[0].weight).T,
                              "b": a(ref.health_mlp[0].bias)},
                       "l2": {"w": a(ref.health_mlp[2].weight).T,
                              "b": a(ref.health_mlp[2].bias)}},
        "image_trs": {"w": a(ref.image_trs.weight).T,
                      "b": a(ref.image_trs.bias)},
        "text_trs": {"w": a(ref.text_trs.weight).T,
                     "b": a(ref.text_trs.bias)},
        "image_embedding": a(ref.image_embedding.weight),
        "text_embedding": a(ref.text_embedding.weight),
    }


def test_cikm_loss_parts_match_torch(synth_root):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.models import get_model

    ref_config, ref_dataset, ref_model = _build_reference(synth_root)

    cfg, meta = make_config(synth_root, model="CIKM_Model", overrides={
        "attention_probs_dropout_prob": 0.0})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    ours = get_model("CIKM_Model")(cfg, data)

    params = _copy_params(ref_model)
    # structural check against our own init
    init = ours.init_params(jax.random.PRNGKey(0))
    assert jax.tree.map(lambda x: x.shape, params) == \
        jax.tree.map(lambda x: x.shape, init)

    rng = np.random.default_rng(3)
    b = 32
    u = rng.integers(0, data.num_users, size=b)
    pos = rng.integers(0, data.num_items, size=b)
    neg = rng.integers(0, data.num_items, size=b)

    codes = np.asarray(ref_dataset.ingredientCodeDict, dtype=np.int64)
    nums = np.asarray(ref_dataset.ingredientNum, dtype=np.int64)
    mh = {k: np.asarray(v, dtype=np.float32)
          for k, v in ref_dataset.health_level_multi_hot.items()}
    mh_arr = np.stack([mh[i] for i in range(data.num_items)])

    torch_batch = {
        "u_id": torch.as_tensor(u), "pos_i_id": torch.as_tensor(pos),
        "neg_i_id": torch.as_tensor(neg),
        "pos_ingre_code": torch.as_tensor(codes[pos]),
        "pos_ingre_num": torch.as_tensor(nums[pos]),
        "pos_hl_mh": torch.as_tensor(mh_arr[pos]),
        "neg_ingre_code": torch.as_tensor(codes[neg]),
        "neg_ingre_num": torch.as_tensor(nums[neg]),
        "neg_hl_mh": torch.as_tensor(mh_arr[neg]),
    }
    ref_model.eval()  # dropout already 0; eval() also freezes nothing else
    ref_parts = [float(x) for x in ref_model.calculate_loss(torch_batch)]

    batch = {"u_id": jnp.asarray(u, jnp.int32),
             "pos_i_id": jnp.asarray(pos, jnp.int32),
             "neg_i_id": jnp.asarray(neg, jnp.int32),
             "key": jax.random.PRNGKey(0)}
    our_parts = [float(x) for x in ours.calculate_loss(params, batch)]

    # (mf, loss_health*health, loss_kd*kd, reg) — cikm_model.py:283
    np.testing.assert_allclose(our_parts, ref_parts, rtol=2e-4, atol=1e-5)

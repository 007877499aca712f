# coding: utf-8
"""SCHGN float64 gradient certificate (companion to grad_certificate.py).

SCHGN is the only model whose loss cannot be certified through
`calculate_loss` on both sides directly: its SSL mask stream lives in the
DATALOADER (reference dataloader.py:117-143) and its score MLP has a
hard-coded p=0.5 dropout gated by `is_training` (reference schgn.py:267).
The certificate therefore drives both frameworks through seams:

  * SSL sequences are built once on the host (same contract as the
    dataloader) and injected — ours via the `ssl_*_seq` batch keys,
    reference via compute_ssl_loss directly;
  * score dropout is off on both sides (ours: `deterministic` batch flag ->
    key=None; reference: compute_score(..., is_training=False));
  * the reference side replicates calculate_loss (schgn.py:272-316)
    verbatim around those two substitutions;
  * encoder dropouts are 0 via config overrides (CERT_OVERRIDES).

Writes parity_results/gradcert_SCHGN_{scale}.json like the generic path.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import parity_check as pc  # noqa: E402


def build_ssl_seqs(codes, nums, n_ingredients, rng, masked_p=0.2):
    """Host mirror of the dataloader's ssl_task (dataloader.py:117-143)."""
    masked = codes.copy()
    pos_seq = codes.copy()
    neg_seq = codes.copy()
    b, L = codes.shape
    for r in range(b):
        n = int(nums[r])
        for s in range(n):
            if rng.random() < masked_p:
                masked[r, s] = n_ingredients + 1
                in_recipe = set(codes[r, :n].tolist())
                while True:
                    cand = int(rng.integers(0, n_ingredients))
                    if cand not in in_recipe:
                        neg_seq[r, s] = cand
                        break
    return masked, pos_seq, neg_seq


def certify_schgn(args):
    import jax
    import jax.numpy as jnp
    import torch

    import grad_certificate as gc
    from lockstep_check import flatten_tree, unflatten_like

    data_path = pc.ensure_dataset()
    t0 = time.time()
    _, ref_dataset, ref_model = gc.build_reference("SCHGN", data_path)
    data, model, buf64 = gc.build_ours("SCHGN", data_path)

    flat = gc.PARAM_MAPS["SCHGN"](ref_model)
    template = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                          unflatten_like(template, flat))

    u, pos, neg = gc.make_batch(ref_dataset, data.num_users, data.num_items,
                                args.batch, args.seed)
    codes = np.asarray(ref_dataset.ingredientCodeDict, dtype=np.int64)
    nums = np.asarray(ref_dataset.ingredientNum, dtype=np.int64)
    img = np.asarray(ref_dataset.embImage, dtype=np.float64)
    cal = np.zeros(ref_dataset.num_items, dtype=np.int64)
    for k, v in ref_dataset.cal_level.items():
        cal[k] = v
    rng = np.random.default_rng(args.seed + 1)
    masked, pos_seq, neg_seq = build_ssl_seqs(codes[pos], nums[pos],
                                              data.num_ingredients, rng)

    # ---- reference composed loss (schgn.py:272-316, is_training=False) ----
    sys.path.insert(0, "/root/reference")
    from FoodRec.models.schgn import l2_loss as ref_l2

    # schgn.py:240 hard-casts the image input to f32 before img_trans (a
    # no-op in the reference's own f32 runs; embImage is stored f32 so the
    # cast is lossless) — lift it back to f64 so the double Linear accepts it
    ref_model.img_trans.register_forward_pre_hook(
        lambda mod, inp: tuple(x.to(torch.float64) for x in inp))

    tt = torch.as_tensor
    ingre_embedding = torch.cat([ref_model.ingre_embed_first,
                                 ref_model.ingre_embed_second,
                                 ref_model.ingre_embed_mask], dim=0)
    ref_model.zero_grad()
    pos_scores, user_emb, pos_item_emb, pos_ingre_emb, pos_hl_emb, g_emb, _ = \
        ref_model.compute_score(tt(u), tt(pos), tt(codes[pos]), tt(nums[pos]),
                                tt(img[pos]), tt(cal[pos]), False,
                                ref_model.g2i_edges, ref_model.i2u_edges,
                                ingre_embedding)
    neg_scores, user_emb, neg_item_emb, neg_ingre_emb, neg_hl_emb, _, _ = \
        ref_model.compute_score(tt(u), tt(neg), tt(codes[neg]), tt(nums[neg]),
                                tt(img[neg]), tt(cal[neg]), False,
                                ref_model.g2i_edges, ref_model.i2u_edges,
                                ingre_embedding)
    with gc._f64_scalar_guard():
        ssl_t = ref_model.ssl * ref_model.compute_ssl_loss(
            ingre_embedding, g_emb, tt(masked), tt(pos_seq), tt(neg_seq))
    bpr_t = -torch.sum(torch.log(torch.sigmoid(pos_scores - neg_scores)))
    reg_t = ref_model.regs * (
        ref_l2(user_emb) + ref_l2(pos_item_emb) + ref_l2(neg_item_emb)
        + ref_l2(pos_ingre_emb) + ref_l2(neg_ingre_emb))
    reg_t = reg_t + ref_model.reg_health * (ref_l2(pos_hl_emb)
                                            + ref_l2(neg_hl_emb))
    reg_t = reg_t + ref_model.reg_image * ref_l2(ref_model.img_trans.weight)
    reg_t = reg_t + ref_model.reg_w * (
        ref_l2(ref_model.W_concat.weight)
        + ref_l2(ref_model.output_mlp.weight))
    reg_t = reg_t + ref_model.reg_g * ref_l2(ref_model.new_gcn.conv1.lin.weight)
    (bpr_t + reg_t + ssl_t).backward()
    ref_parts = [float(bpr_t), float(reg_t), float(ssl_t)]
    ref_grads = gc.torch_grads_in_our_layout("SCHGN", ref_model)

    # ---- ours: calculate_loss with the deterministic/injection seams ------
    batch = {"u_id": jnp.asarray(u, jnp.int32),
             "pos_i_id": jnp.asarray(pos, jnp.int32),
             "neg_i_id": jnp.asarray(neg, jnp.int32),
             "key": jax.random.PRNGKey(0),
             "deterministic": True,
             "ssl_masked_seq": jnp.asarray(masked, jnp.int32),
             "ssl_pos_seq": jnp.asarray(pos_seq, jnp.int32),
             "ssl_neg_seq": jnp.asarray(neg_seq, jnp.int32)}

    def fn(pp):
        with model.bind(buf64):
            ls = model.calculate_loss(pp, batch)
        return sum(ls), jnp.stack([jnp.asarray(x) for x in ls])

    (_, parts_j), grads = jax.value_and_grad(fn, has_aux=True)(params)
    our_parts = [float(x) for x in parts_j]
    our_grads = flatten_tree(jax.tree.map(np.asarray, grads))

    leaves, worst = gc.compare_grads(ref_grads, our_grads)
    loss_rel = [abs(o - r) / (abs(r) + 1e-30)
                for o, r in zip(our_parts, ref_parts)]
    summary = {
        "model": "SCHGN", "scale": args.scale, "batch": args.batch,
        "seed": args.seed, "dtype": "float64",
        "overrides": gc.CERT_OVERRIDES["SCHGN"],
        "seams": ["is_training=False score dropout (both sides)",
                  "host-built SSL sequences injected (both sides)"],
        "loss_parts_ref": ref_parts, "loss_parts_ours": our_parts,
        "loss_parts_relmax": max(loss_rel),
        "grad_relmax_worst_leaf": worst,
        "grad_worst_leaves": dict(sorted(
            leaves.items(), key=lambda kv: -kv[1]["relmax"])[:5]),
        "n_param_leaves": len(leaves),
        "wall_s": round(time.time() - t0, 1),
        "pass_1e-9": worst < 1e-9 and max(loss_rel) < 1e-9,
    }
    out = os.path.join(REPO, "parity_results",
                       f"gradcert_SCHGN_{args.scale}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"GRADCERT SCHGN {args.scale}: worst grad relmax {worst:.3e}, "
          f"loss relmax {max(loss_rel):.3e}, pass_1e-9={summary['pass_1e-9']}"
          f" ({summary['wall_s']}s)", flush=True)
    return summary["pass_1e-9"]

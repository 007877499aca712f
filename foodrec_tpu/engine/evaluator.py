# coding: utf-8
"""Batched by-user evaluation: the TPU replacement for the reference's
per-user Python eval loop (FoodRec/common/trainer.py:231-282 with
EvalByUserDataloader, utils/dataloader.py:228-302).

Semantics preserved exactly:
  * candidate list per user = [positives..., negatives-minus-dup-pos...]
    (already padded into a static [U, C] EvalSet, data/device.py)
  * AUC = mean over positives of #(neg_score < pos_score) / (n_pos * neg_num)
    with neg_num = config['neg_sample_num'] regardless of actual negative
    count (trainer.py:49-52)
  * ranking = scores sorted descending over the candidate list;
    Recall@k = hits/n_pos, NDCG@k with IDCG truncated at min(k, n_pos)
    (trainer.py:55-69, 253-268)

Instead of a per-user loop, a whole user block is scored as one [B, C] matmul
and the metrics are computed on-device with top_k + masked reductions.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("neg_num", "max_k"))
def by_user_metrics(scores, n_pos, n_cand, neg_num, max_k=20):
    """Per-user metrics from padded candidate scores.

    scores: float32 [B, C]  (padded slots may hold junk; masked here)
    n_pos:  int32 [B]       positives occupy slots [0, n_pos)
    n_cand: int32 [B]       valid slots are [0, n_cand)
    Returns dict of [B] arrays: auc, recall@10/20, ndcg@10/20.
    """
    b, c = scores.shape
    slot = jnp.arange(c)[None, :]                       # [1, C]
    valid = slot < n_cand[:, None]                      # [B, C]
    is_pos = slot < n_pos[:, None]                      # [B, C]
    is_neg = valid & ~is_pos

    masked = jnp.where(valid, scores, NEG_INF)

    # ---- AUC (pairwise, strict <; trainer.py:49-52) -----------------------
    # count per positive of negatives scoring strictly lower. The [B, C, C]
    # comparison looks wasteful but beats a sort+searchsorted variant ~2x on
    # TPU: binary search lowers to sequential gathers, dense compares ride
    # the VPU (measured: 5.7s vs 10.3s for the Foodcom test eval).
    less = (scores[:, None, :] < scores[:, :, None])    # [B, Cpos, Cneg]
    pair = less & is_pos[:, :, None] & is_neg[:, None, :]
    auc = jnp.sum(pair, axis=(1, 2)) / (
        jnp.maximum(n_pos, 1) * neg_num)

    # ---- ranking metrics --------------------------------------------------
    _, topk_idx = jax.lax.top_k(masked, max_k)          # [B, max_k]
    hit = topk_idx < n_pos[:, None]                     # positive slots lead
    ranks = jnp.arange(max_k)[None, :]
    gains = 1.0 / jnp.log2(ranks + 2.0)

    out = {"auc": auc}
    for k in (10, 20):
        hk = hit[:, :k]
        dcg = jnp.sum(hk * gains[:, :k], axis=1)
        # idcg over min(k, n_pos) leading positions
        ideal = ranks[:, :k] < jnp.minimum(n_pos, k)[:, None]
        idcg = jnp.sum(ideal * gains[:, :k], axis=1)
        out[f"ndcg@{k}"] = dcg / jnp.maximum(idcg, 1e-12)
        out[f"recall@{k}"] = jnp.sum(hk, axis=1) / jnp.maximum(n_pos, 1)
    return out


def evaluate_by_user(score_fn, eval_set, neg_num, batch_size=256,
                     return_per_user=False, block_fn=None):
    """Run the by-user eval over a padded EvalSet.

    score_fn(users_int32[B], cand_int32[B, C]) -> float32 [B, C], called on
    fixed-size user blocks; must be jax-traceable (it is fused with the
    metric computation into one dispatch per block). Callers that evaluate
    repeatedly should pass a stable jitted `block_fn(users, cand, n_pos,
    n_cand) -> (scores, metrics)` to avoid per-call retracing (the Trainer
    does).

    Returns (valid_score, metrics_dict) with the reference's metric keys
    (AUC, Recall@10/20, NDCG@10/20); valid_score = NDCG@20
    (trainer.py:272-282).
    """
    users = eval_set.users
    cand = eval_set.cand
    n_pos = eval_set.n_pos
    n_cand = eval_set.n_cand
    u = len(users)

    pad = (-u) % batch_size
    if pad:
        users = np.concatenate([users, np.zeros(pad, users.dtype)])
        cand = np.concatenate([cand, np.zeros((pad, cand.shape[1]), cand.dtype)])
        n_pos = np.concatenate([n_pos, np.zeros(pad, n_pos.dtype)])
        n_cand = np.concatenate([n_cand, np.zeros(pad, n_cand.dtype)])

    # one fused dispatch per block, no host sync until the end — the TPU
    # tunnel has high per-call latency, so scoring+metrics are a single jit
    # call and blocks pipeline asynchronously
    if block_fn is None:
        @jax.jit
        def block_fn(users_b, cand_b, n_pos_b, n_cand_b):
            scores = score_fn(users_b, cand_b)
            return scores, by_user_metrics(scores, n_pos_b, n_cand_b,
                                           neg_num=neg_num)

    per_user = {k: [] for k in
                ("auc", "recall@10", "recall@20", "ndcg@10", "ndcg@20")}
    preds = [] if return_per_user else None
    for s in range(0, len(users), batch_size):
        e = s + batch_size
        scores, m = block_fn(jnp.asarray(users[s:e]), jnp.asarray(cand[s:e]),
                             jnp.asarray(n_pos[s:e]), jnp.asarray(n_cand[s:e]))
        for k, v in m.items():
            per_user[k].append(v)
        if return_per_user:
            preds.append(scores)

    per_user = {k: np.asarray(jnp.concatenate(v))[:u]
                for k, v in per_user.items()}
    metrics = {
        "AUC": float(per_user["auc"].mean()),
        "Recall@10": float(per_user["recall@10"].mean()),
        "Recall@20": float(per_user["recall@20"].mean()),
        "NDCG@10": float(per_user["ndcg@10"].mean()),
        "NDCG@20": float(per_user["ndcg@20"].mean()),
    }
    valid_score = metrics["NDCG@20"]
    if return_per_user:
        return (valid_score, metrics, per_user,
                np.asarray(jnp.concatenate(preds))[:u])
    return valid_score, metrics

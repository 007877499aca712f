"""By-user eval metric parity against the reference's numpy formulas
(FoodRec/common/trainer.py:49-69, 231-282)."""

import math

import jax.numpy as jnp

import numpy as np
import pytest

from foodrec_tpu.engine.evaluator import by_user_metrics, evaluate_by_user


def ref_get_auc_fast(rel_list, predictions, neg_num):
    neg_predictions = predictions[len(rel_list):]
    auc_value = np.sum(
        [np.sum(neg_predictions < predictions[idx]) for idx in rel_list])
    return auc_value / (len(rel_list) * neg_num)


def ref_metrics_by_user(doc_list, rel_list):
    dcg, hit_num = 0.0, 0.0
    for i in range(len(doc_list)):
        if doc_list[i] in rel_list:
            dcg += 1 / (math.log(i + 2) / math.log(2))
            hit_num += 1
    idcg = 0.0
    for i in range(min(len(doc_list), len(rel_list))):
        idcg += 1 / (math.log(i + 2) / math.log(2))
    return hit_num / len(rel_list), dcg / idcg


def ref_eval(predictions, n_pos, neg_num):
    """The reference _valid_by_user_epoch body for one user."""
    gt_idx = range(n_pos)
    pred_idx = np.argsort(predictions)[::-1]
    auc = ref_get_auc_fast(gt_idx, predictions, neg_num)
    out = {"auc": auc}
    for k in (10, 20):
        rec, ndcg = ref_metrics_by_user(pred_idx[:k], gt_idx)
        out[f"recall@{k}"] = rec
        out[f"ndcg@{k}"] = ndcg
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_by_user_metrics_match_reference(rng, seed):
    rng = np.random.default_rng(seed)
    B, C, neg_num = 7, 60, 50
    n_pos = rng.integers(1, 8, size=B).astype(np.int32)
    n_cand = np.array([n_pos[b] + rng.integers(30, C - 10) for b in range(B)],
                      dtype=np.int32)
    scores = rng.normal(size=(B, C)).astype(np.float32)

    got = by_user_metrics(scores, n_pos, n_cand, neg_num=neg_num)
    for b in range(B):
        ref = ref_eval(scores[b, :n_cand[b]], int(n_pos[b]), neg_num)
        for k, v in ref.items():
            # float32 log2 on device vs float64 math.log on host
            assert np.asarray(got[k])[b] == pytest.approx(v, rel=3e-4), (b, k)


def test_evaluate_by_user_full_pipeline(rng):
    from foodrec_tpu.data.device import EvalSet

    B, C = 10, 40
    n_pos = rng.integers(1, 5, size=B).astype(np.int32)
    n_cand = np.full(B, C, dtype=np.int32)
    cand = np.stack([rng.permutation(C) for _ in range(B)]).astype(np.int32)
    es = EvalSet(users=np.arange(B, dtype=np.int32), cand=cand,
                 n_pos=n_pos, n_cand=n_cand)

    table = rng.normal(size=(B, C)).astype(np.float32)
    table_j = jnp.asarray(table)

    def score_fn(users, cand):  # must be jax-traceable (fused into jit)
        return jnp.take_along_axis(table_j[users % B], cand, axis=1)

    score, metrics = evaluate_by_user(score_fn, es, neg_num=35, batch_size=4)
    assert score == pytest.approx(metrics["NDCG@20"])
    refs = []
    for b in range(B):
        preds = table[b][cand[b]]
        refs.append(ref_eval(preds, int(n_pos[b]), 35))
    assert metrics["AUC"] == pytest.approx(
        np.mean([r["auc"] for r in refs]), rel=1e-5)
    assert metrics["Recall@10"] == pytest.approx(
        np.mean([r["recall@10"] for r in refs]), rel=1e-5)
    assert metrics["NDCG@20"] == pytest.approx(
        np.mean([r["ndcg@20"] for r in refs]), rel=1e-5)

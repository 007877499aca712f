"""Full-sort + sampled eval: metric kernels vs the reference's literal numpy
formulas (FoodRec/common/matrics.py), and the trainer's three eval paths."""

import numpy as np
import pytest

from foodrec_tpu.engine.matrics import map_, ndcg_, precision_, recall2_, recall_
from foodrec_tpu.engine.topk_evaluator import sample_rank_metrics

from tests.conftest import make_config


# --- oracle: reference formulas with their original row loops ---------------

def ref_ndcg(pos_index, pos_len):
    len_rank = np.full_like(pos_len, pos_index.shape[1])
    idcg_len = np.where(pos_len > len_rank, len_rank, pos_len)
    iranks = np.zeros_like(pos_index, dtype=np.float32)
    iranks[:, :] = np.arange(1, pos_index.shape[1] + 1)
    idcg = np.cumsum(1.0 / np.log2(iranks + 1), axis=1)
    for row, idx in enumerate(idcg_len):
        idcg[row, idx:] = idcg[row, idx - 1]
    ranks = np.zeros_like(pos_index, dtype=np.float32)
    ranks[:, :] = np.arange(1, pos_index.shape[1] + 1)
    dcg = 1.0 / np.log2(ranks + 1)
    dcg = np.cumsum(np.where(pos_index, dcg, 0), axis=1)
    return (dcg / idcg).mean(axis=0)


def ref_map(pos_index, pos_len):
    pre = pos_index.cumsum(axis=1) / np.arange(1, pos_index.shape[1] + 1)
    sum_pre = np.cumsum(pre * pos_index.astype(np.float32), axis=1)
    len_rank = np.full_like(pos_len, pos_index.shape[1])
    actual_len = np.where(pos_len > len_rank, len_rank, pos_len)
    result = np.zeros_like(pos_index, dtype=np.float32)
    for row, lens in enumerate(actual_len):
        ranges = np.arange(1, pos_index.shape[1] + 1)
        ranges[lens:] = ranges[lens - 1]
        result[row] = sum_pre[row] / ranges
    return result.mean(axis=0)


@pytest.mark.parametrize("seed", [0, 3])
def test_metric_kernels_match_reference(seed):
    rng = np.random.default_rng(seed)
    n, k = 37, 20
    pos_index = rng.random((n, k)) < 0.2
    pos_len = rng.integers(1, 30, size=n)

    np.testing.assert_allclose(ndcg_(pos_index, pos_len),
                               ref_ndcg(pos_index, pos_len), rtol=1e-6)
    np.testing.assert_allclose(map_(pos_index, pos_len),
                               ref_map(pos_index, pos_len), rtol=1e-6)
    # cross-checks of the simple kernels against first principles
    np.testing.assert_allclose(
        recall_(pos_index, pos_len)[-1],
        (pos_index.sum(1) / pos_len).mean())
    np.testing.assert_allclose(
        recall2_(pos_index, pos_len)[-1],
        pos_index.sum() / pos_len.sum())
    np.testing.assert_allclose(
        precision_(pos_index, pos_len)[-1], pos_index.mean())


def test_sample_rank_metrics_match_reference():
    rng = np.random.default_rng(5)
    n, m = 50, 21
    preds = rng.normal(size=(n, m))

    got = sample_rank_metrics(preds, m - 1)

    # reference loops (trainer.py:317-349)
    auc_value = np.sum([np.sum(p[0:-1] < p[-1]) for p in preds])
    assert got["AUC"] == pytest.approx(auc_value / n / (m - 1))
    rank = (-preds).argsort().argsort()[:, -1]
    for k in (1, 5, 10, 20):
        ndcg = hit = mrr = 0.0
        for r in rank:
            mrr += 1.0 / (r + 1.0)
            if r < k:
                ndcg += 1.0 / np.log2(r + 2.0)
                hit += 1.0
        assert got[f"HIT@{k}"] == pytest.approx(hit / n)
        assert got[f"NDCG@{k}"] == pytest.approx(ndcg / n)
        assert got["MRR"] == pytest.approx(mrr / n)


def _fit(synth_root, overrides):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, meta = make_config(synth_root, model="LightGCN", overrides={
        "epochs": 2, "eval_step": 2, "train_batch_size": 16,
        "stopping_step": 10, "seed": 999, **overrides})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("LightGCN")(cfg, data)
    return cfg, data, Trainer(cfg, model)


def test_full_sort_path(synth_root, tmp_path):
    cfg, data, trainer = _fit(synth_root, {
        "eval_by_user": False, "full_sort": True, "topk": [5, 10, 20, 50],
        "recommend_topk": str(tmp_path / "topk"),
        "save_recommended_topk": True})
    _, valid_res, test_res = trainer.fit(data, saved=False, hyper_tuple=(999,))
    for metric in ("recall", "ndcg", "precision", "map"):
        for k in (5, 10, 20, 50):
            assert f"{metric}@{k}" in test_res
            assert 0.0 <= test_res[f"{metric}@{k}"] <= 1.0
    # recall@50 over a 60-item catalog must be substantial
    assert test_res["recall@50"] > 0.5
    # top-k CSV dump happened (topk_evaluator.py:87-100 parity)
    dumps = list((tmp_path / "topk").glob("*.csv"))
    assert len(dumps) == 1


def test_sampled_path(synth_root):
    cfg, data, trainer = _fit(synth_root, {
        "eval_by_user": False, "full_sort": False})
    _, valid_res, test_res = trainer.fit(data, saved=False, hyper_tuple=(999,))
    assert set(test_res) == {"AUC", "MRR", "HIT@1", "HIT@5", "HIT@10",
                             "HIT@20", "NDCG@1", "NDCG@5", "NDCG@10",
                             "NDCG@20"}
    assert 0.0 <= test_res["AUC"] <= 1.0
    assert test_res["HIT@20"] >= test_res["HIT@10"] >= test_res["HIT@1"]

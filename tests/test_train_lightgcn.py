"""End-to-end: LightGCN trains on the synthetic dataset and improves
(SURVEY.md §7 step 4 milestone)."""

import numpy as np

from tests.conftest import make_config


def _load(synth_root, model="LightGCN", overrides=None):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData

    cfg, meta = make_config(synth_root, model=model, overrides=overrides)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    return cfg, data


def test_lightgcn_end_to_end(synth_root):
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, data = _load(synth_root, overrides={
        "epochs": 6, "eval_step": 2, "train_batch_size": 16,
        "stopping_step": 10, "seed": 999,
    })
    model = get_model("LightGCN")(cfg, data)
    trainer = Trainer(cfg, model)
    best_valid, valid_res, test_res = trainer.fit(data, saved=False,
                                                  hyper_tuple=(999,))
    assert set(test_res) == {"AUC", "Recall@10", "Recall@20",
                             "NDCG@10", "NDCG@20"}
    assert 0.0 <= test_res["NDCG@20"] <= 1.0
    assert 0.0 <= test_res["AUC"] <= 1.0
    # loss decreased over training
    losses = [trainer.train_loss_dict[e] for e in sorted(trainer.train_loss_dict)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_lightgcn_memorizes_train_positives(synth_root):
    """The synthetic interactions are random, so held-out AUC stays ~0.5;
    what training must achieve is ranking *train* positives above
    non-positives (BPR memorization)."""
    import jax

    from foodrec_tpu.data.device import build_eval_set
    from foodrec_tpu.engine.evaluator import evaluate_by_user
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg, data = _load(synth_root, overrides={
        "epochs": 40, "eval_step": 40, "train_batch_size": 32,
        "stopping_step": 50, "seed": 999, "learning_rate": 0.05,
    })
    model = get_model("LightGCN")(cfg, data)
    trainer = Trainer(cfg, model)
    trainer.fit(data, saved=False, hyper_tuple=(999,))

    # rebuild an eval set whose positives are the train items
    users = [u for u in range(data.num_users) if data.trainList[u]]
    ratings = [data.trainList[u] for u in users]
    negatives = [[i for i in range(data.num_items)
                  if i not in set(data.trainList[u])][:20] for u in users]
    train_es = build_eval_set(users, ratings, negatives)

    # re-fit leaves best params only inside fit; rerun a fresh fit capturing
    # the final params via the trainer's score path
    key = jax.random.PRNGKey(999)
    params = model.init_params(key)
    opt_state = trainer.optimizer.init(params)
    for _ in range(40):
        key, k = jax.random.split(key)
        params, opt_state, _ = trainer._epoch_fn(params, opt_state, k)

    import functools
    score_fn = functools.partial(jax.jit(model.score_candidates), params)
    _, metrics = evaluate_by_user(score_fn, train_es, neg_num=20,
                                  batch_size=8)
    assert metrics["AUC"] > 0.8

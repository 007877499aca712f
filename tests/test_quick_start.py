"""quick_start grid-search driver (reference utils/quick_start.py:17-106):
multiple hyper combos, leaderboard selection, checkpoint artifacts."""

import os

import numpy as np
import pytest


def test_quick_start_grid_search(synth_root, tmp_path, monkeypatch):
    from foodrec_tpu.engine.quick_start import quick_start

    root, meta = synth_root
    monkeypatch.chdir(tmp_path)  # log/ and ckp/ artifacts land here
    best = quick_start(
        model="LightGCN", dataset="Synth",
        config_dict={
            "data_path": root.rsplit("/Synth", 1)[0] + "/",
            "neg_sample_num": meta["neg_num"],
            "epochs": 2, "eval_step": 2, "train_batch_size": 16,
            "stopping_step": 10,
            # grid: 2 flagD values x 1 seed = 2 combos
            "seed": [999], "flagD": [1, 3],
            "hyper_parameters": ["flagD"],
        },
        save_model=True, mg=False)

    hyper_tuple, valid_result, test_result = best
    # 'seed' is appended to hyper_parameters (configurator.py:106-108)
    assert hyper_tuple[1] == 999 and hyper_tuple[0] in (1, 3)
    assert set(test_result) == {"AUC", "Recall@10", "Recall@20",
                                "NDCG@10", "NDCG@20"}
    assert np.isfinite(list(test_result.values())).all()
    # checkpoints were written per combo (trainer.fit saved=True)
    ckps = os.listdir(tmp_path / "ckp")
    assert len(ckps) >= 2
    # log file exists with the leaderboard
    logs = os.listdir(tmp_path / "log")
    assert len(logs) >= 1

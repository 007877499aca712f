# coding: utf-8
"""TPU bit-exactness check for the row-sparse Adam path: two CIKM epochs
on a small synthetic, dense vs row-sparse, all param/opt leaves compared
bitwise on the real chip. CPU equality is pinned by tests/test_sparse_adam;
the TPU backend optimizes the two (different) epoch executables
independently, so this re-checks on hardware before the fast path is
trusted for parity work.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def run(row_sparse):
    import jax

    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model

    cfg = Config(model="CIKM_Model", dataset="Synth", config_dict={
        "data_path": "/tmp/ds_rs/", "epochs": 2, "train_batch_size": 64,
        "seed": 999, "neg_sample_num": 50, "epoch_scan_chunk": 16,
        "row_sparse_table_update": row_sparse})
    derive_data_paths(cfg, "Synth")
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)
    params = model.init_params(jax.random.PRNGKey(5))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(6)
    for _ in range(2):
        key, k = jax.random.split(key)
        params, opt_state, parts = trainer._epoch_fn(params, opt_state, k)
    return (jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, opt_state), np.asarray(parts))


def main():
    import os

    from foodrec_tpu.data import synthetic
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    if not os.path.exists("/tmp/ds_rs/Synth"):
        synthetic.generate("/tmp/ds_rs/Synth", n_users=300, n_items=600,
                           neg_num=50, latent_dim=8)
    import jax
    print("backend:", jax.default_backend())
    p0, s0, l0 = run(False)
    p1, s1, l1 = run(True)
    ok = np.array_equal(l0, l1)
    print("loss parts equal:", ok)
    import jax.tree_util as jtu
    bad = []
    for (path, a), (_, b) in zip(jtu.tree_flatten_with_path(p0)[0],
                                 jtu.tree_flatten_with_path(p1)[0]):
        if not np.array_equal(a, b):
            bad.append(("param", jtu.keystr(path),
                        float(np.abs(a - b).max())))
    for (path, a), (_, b) in zip(jtu.tree_flatten_with_path(s0)[0],
                                 jtu.tree_flatten_with_path(s1)[0]):
        if not np.array_equal(a, b):
            bad.append(("opt", jtu.keystr(path), float(np.abs(a - b).max())))
    if bad or not ok:
        print("MISMATCH:", bad[:20])
        sys.exit(1)
    print("TPU BITWISE OK: all param and opt-state leaves identical")


if __name__ == "__main__":
    main()

# coding: utf-8
"""Attribute named HLO fusions from the compiled CIKM epoch executable back
to jaxpr source lines (op metadata). Complements tools/profile_epoch.py:
that tool says *which* fusions are hot; this one says *what* they compute.

Usage: python tools/attr_fusions.py multiply_add_fusion.284 fusion.1243 ...
"""

import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    targets = sys.argv[1:]
    if not targets:
        targets = ["multiply_add_fusion.284"]

    import bench
    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import FoodData, derive_data_paths
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.engine.trainer import Trainer
    from foodrec_tpu.models import get_model
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax

    data_path = bench.ensure_dataset()
    cfg = Config(model="CIKM_Model", dataset=bench.DATASET,
                 config_dict={"data_path": data_path, "neg_sample_num": 500,
                              "seed": 999})
    derive_data_paths(cfg, bench.DATASET)
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    model = get_model("CIKM_Model")(cfg, data)
    trainer = Trainer(cfg, model)

    params = model.init_params(jax.random.PRNGKey(999))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(0)
    k_perm, k_steps = jax.random.split(key)
    import jax.numpy as jnp
    perm = jnp.arange(trainer.n_batches * trainer.train_batch_size,
                      dtype=jnp.int32) % trainer.n_train
    ln = max(trainer._chunk_lens)   # dominant scan-chunk executable
    fn = trainer._make_chunk_fn(ln)
    lowered = fn.lower(params, opt_state, perm, k_steps, jnp.int32(0),
                       trainer._buffers, trainer._train_u, trainer._train_i,
                       trainer._excl)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"# HLO text: {len(txt) / 1e6:.1f} MB", file=sys.stderr)

    lines = txt.splitlines()
    # index fusion definitions: "%name = ... fusion(...), kind=..., calls=%comp"
    for tgt in targets:
        pat = re.compile(r"%?" + re.escape(tgt) + r"\b")
        hits = [i for i, l in enumerate(lines)
                if pat.search(l) and "= " in l and tgt in l.split("= ")[0]]
        print(f"\n=== {tgt}: {len(hits)} definition(s) ===")
        for i in hits[:4]:
            l = lines[i].strip()
            print(l[:400])
            m = re.search(r"calls=%?([\w.\-]+)", l)
            meta = re.search(r'metadata=\{([^}]*)\}', l)
            if meta:
                print("  meta:", meta.group(1)[:300])
            if m:
                comp = m.group(1)
                # print the called computation body (first 40 lines)
                start = None
                for j, ll in enumerate(lines):
                    if ll.strip().startswith(f"%{comp} ") or \
                       ll.strip().startswith(f"{comp} "):
                        start = j
                        break
                if start is not None:
                    print(f"  --- computation {comp} ---")
                    for ll in lines[start:start + 50]:
                        s = ll.rstrip()
                        mm = re.search(r'op_name="([^"]*)"', s)
                        src = re.search(
                            r'source_file="([^"]*)".*source_line=(\d+)', s)
                        head = s.split(" metadata=")[0]
                        print("   ", head[:200])
                        if mm or src:
                            print("      >>",
                                  (mm.group(1)[:160] if mm else ""),
                                  (f"{src.group(1)}:{src.group(2)}"
                                   if src else ""))
                        if s.strip() == "}":
                            break


if __name__ == "__main__":
    main()

# coding: utf-8
"""Module CLI entry: python -m foodrec_tpu.runner -m MODEL -d DATASET [--mg]
(reference: FoodRec/runner.py:16-28). Extra --data_path/--epochs overrides for
driving synthetic datasets."""

import argparse
import os

os.environ.setdefault("NUMEXPR_MAX_THREADS", "48")


def main():
    from foodrec_tpu.engine.quick_start import quick_start

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="SCHGN")
    parser.add_argument("--dataset", "-d", type=str, default="Foodcom")
    parser.add_argument("--mg", action="store_true")
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--neg_sample_num", type=int, default=None)
    args, _ = parser.parse_known_args()

    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    config_dict = {"gpu_id": 0}
    for k in ("data_path", "epochs", "neg_sample_num"):
        if getattr(args, k) is not None:
            config_dict[k] = getattr(args, k)
    quick_start(model=args.model, dataset=args.dataset,
                config_dict=config_dict, save_model=True, mg=args.mg)


if __name__ == "__main__":
    main()

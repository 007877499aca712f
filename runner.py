# coding: utf-8
"""CLI entry point (reference: FoodRec/runner.py:16-28).

    python runner.py -m MODEL -d DATASET [--mg]
"""

import argparse
import os

os.environ.setdefault("NUMEXPR_MAX_THREADS", "48")

from foodrec_tpu.engine.quick_start import quick_start  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="SCHGN",
                        help="name of models")
    parser.add_argument("--dataset", "-d", type=str, default="Foodcom",
                        help="name of datasets")
    parser.add_argument("--mg", action="store_true",
                        help="whether to use Mirror Gradient")
    args, _ = parser.parse_known_args()

    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    config_dict = {"gpu_id": 0}
    quick_start(model=args.model, dataset=args.dataset,
                config_dict=config_dict, save_model=True, mg=args.mg)

"""foodrec-tpu: a TPU-native (JAX/XLA/Pallas/pjit) multimodal food-recommendation
framework with the capabilities of sdu-zyx/Multi-modal-Food-Recommendation.

Public surface mirrors the reference (`/root/reference/FoodRec`): yaml-driven
Config, `quick_start` grid-search driver, the FoodData on-disk dataset contract,
and the six-model zoo (LightGCN, BM3, FGCN, SCHGN, PRICAI_ModelX/CLUSSL,
CIKM_Model/HealthRec) — re-designed TPU-first:

  * graph propagation = padded ELL / sorted-COO segment-sum SpMM (Pallas kernel
    for the hot path, XLA fallback) instead of torch.sparse.mm
    (reference: FoodRec/models/lightgcn.py:134-147)
  * whole epochs stay on device: PRNG negative sampling, feature gathers and the
    train step run under one jit (reference moves batches host->device per step,
    FoodRec/common/trainer.py:177-179)
  * evaluation = batched padded candidate scoring / tiled users x items matmul
    with on-chip top-k (reference: per-user Python loops,
    FoodRec/common/trainer.py:231-282)
  * scale-out via jax.sharding.Mesh + explicit shardings (reference has no
    distributed backend, FoodRec/utils/configurator.py:110-114)
"""

__version__ = "0.1.0"

from foodrec_tpu.config import Config  # noqa: F401

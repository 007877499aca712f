# coding: utf-8
"""Device-mesh scale-out (SURVEY.md §5.8, §7 step 8).

The reference has no distributed backend at all — it selects one CUDA device
via CUDA_VISIBLE_DEVICES (FoodRec/utils/configurator.py:110-114) and moves
batches with .to(device) (trainer.py:178-179). The TPU-native replacement is
a jax.sharding.Mesh with named axes:

  * 'data'  — interactions are sharded per train step; pjit emits the psum
    gradient reduction over ICI automatically
  * 'model' — item-dim sharding of embedding tables / features for model-axis
    training and distributed full-catalog eval (exercised by tests/test_mesh.py
    and the driver's 2-D {data×model} dryrun, MULTICHIP_r04.json: max param
    delta 0.00e+00 vs replicated)

config['mesh_shape'] (e.g. {data: 8}) switches it on; all sharding is
expressed as with_sharding_constraint inside the already-jitted epoch, so the
single-chip path is unchanged.
"""

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape):
    """mesh_shape: dict axis-name -> size, e.g. {'data': 8}."""
    if not mesh_shape:
        return None
    names = tuple(mesh_shape.keys())
    sizes = tuple(int(v) for v in mesh_shape.values())
    if int(np.prod(sizes)) > len(jax.devices()):
        raise ValueError(
            f"mesh {mesh_shape} needs {np.prod(sizes)} devices, "
            f"have {len(jax.devices())}")
    devices = mesh_utils.create_device_mesh(sizes)
    return Mesh(devices, names)


def batch_sharding(mesh):
    """Leading-dim 'data' sharding for per-step batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Constrain every rank>=1 batch array to be data-sharded; scalars and
    PRNG keys stay replicated."""
    if mesh is None:
        return batch
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def constrain(k, v):
        if (k != "key" and hasattr(v, "ndim") and v.ndim >= 1
                and v.shape[0] % mesh.shape["data"] == 0):
            return jax.lax.with_sharding_constraint(v, bs)
        return jax.lax.with_sharding_constraint(v, rep)

    return {k: constrain(k, v) for k, v in batch.items()}

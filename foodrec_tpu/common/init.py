# coding: utf-8
"""Parameter initializers matching torch semantics (FoodRec/common/init.py).

torch's xavier_* on an Embedding(num, dim) treats the table as a [num, dim]
linear weight: gain * sqrt(6/(fan_in+fan_out)) bounds with fan_in=dim,
fan_out=num (torch fan order is [out, in] = [num, dim] -> fan_in=dim). jax
initializers use column/row conventions; we implement torch's exactly so model
variance at init matches the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _torch_fans(shape):
    """torch.nn.init._calculate_fan_in_and_fan_out for a 2-D weight [out, in]."""
    if len(shape) == 2:
        fan_in, fan_out = shape[1], shape[0]
    elif len(shape) == 1:
        fan_in = fan_out = shape[0]
    else:
        receptive = int(np.prod(shape[2:]))
        fan_in = shape[1] * receptive
        fan_out = shape[0] * receptive
    return fan_in, fan_out


def xavier_uniform(key, shape, dtype=jnp.float32, gain=1.0):
    fan_in, fan_out = _torch_fans(shape)
    bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_normal(key, shape, dtype=jnp.float32, gain=1.0):
    fan_in, fan_out = _torch_fans(shape)
    std = gain * np.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def truncated_normal(key, shape, dtype=jnp.float32, mean=0.0, std=1.0):
    """2-sigma truncated normal (SCHGN's init, schgn.py:18-26)."""
    return mean + std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def kaiming_uniform_linear(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for [out, in] weights."""
    fan_in, _ = _torch_fans(shape)
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_params(key, in_dim, out_dim, dtype=jnp.float32, init=xavier_normal,
                  with_bias=True):
    """A {'w': [in,out], 'b': [out]} linear layer (bias zero like the
    reference's xavier initializers, init.py:7-42). The kernel is stored
    [in, out] (JAX convention); the initializer sees torch's [out, in] fans."""
    kw, _ = jax.random.split(key)
    w = init(kw, (out_dim, in_dim), dtype).T
    p = {"w": w}
    if with_bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def linear_apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y

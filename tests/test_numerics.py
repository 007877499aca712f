# coding: utf-8
"""NaN-safety of gradient-bearing numerics.

Two reference-parity hazards guarded here (both bit torch users never see):
  * jnp.linalg.norm's VJP at an exactly-zero vector is 0/0 = NaN, and the NaN
    survives any downstream maximum(n, eps) clamp through the chain rule;
    torch's F.normalize / cosine_similarity backward is clamped to 0 there.
  * clip(log(sigmoid(z)), -100) has a 0*inf = NaN VJP once the sigmoid
    saturates; torch BCELoss clamps the backward denominator
    (the CIKM health head hit this at Allrecipes scale, PARITY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from foodrec_tpu.common.loss import safe_l2_norm
from foodrec_tpu.common.ssl_losses import _l2_normalize, min_mutual_information
from foodrec_tpu.models.bm3 import _cos as bm3_cos
from foodrec_tpu.models.cikm_model import _cos as cikm_cos
from foodrec_tpu.models.cikm_model import _normalize as cikm_normalize


def test_safe_l2_norm_value_parity():
    x = jax.random.normal(jax.random.PRNGKey(0), (7, 5))
    for axis in (-1, 0, 1):
        np.testing.assert_allclose(
            np.asarray(safe_l2_norm(x, axis=axis)),
            np.asarray(jnp.linalg.norm(x, axis=axis)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(safe_l2_norm(x, axis=1, keepdims=True)),
        np.asarray(jnp.linalg.norm(x, axis=1, keepdims=True)), rtol=1e-6)
    # zero rows -> zero norm, exact
    z = x.at[2].set(0.0)
    assert float(safe_l2_norm(z, axis=1)[2]) == 0.0


def test_safe_l2_norm_grad_finite_at_zero():
    # the raw jnp.linalg.norm VJP is NaN here — that's the bug being guarded
    g_raw = jax.grad(lambda v: jnp.sum(jnp.linalg.norm(v, axis=-1)))(
        jnp.zeros((3, 4)))
    assert not np.all(np.isfinite(np.asarray(g_raw)))
    g = jax.grad(lambda v: jnp.sum(safe_l2_norm(v, axis=-1)))(jnp.zeros((3, 4)))
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_model_norm_helpers_grad_finite_at_zero():
    zero = jnp.zeros((4, 8))
    rnd = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    for fn in (
        lambda v: jnp.sum(cikm_normalize(v)),
        lambda v: jnp.sum(cikm_cos(v, rnd)),
        lambda v: jnp.sum(cikm_cos(rnd, v)),
        lambda v: jnp.sum(bm3_cos(v, rnd)),
        lambda v: jnp.sum(_l2_normalize(v)),
        lambda v: min_mutual_information(v, rnd, rnd),
    ):
        g = jax.grad(fn)(zero)
        assert np.all(np.isfinite(np.asarray(g))), fn


def test_cikm_health_bce_grad_finite_at_saturation():
    """Saturated-logit BCE must keep finite grads (the Allrecipes NaN)."""

    def loss(z, t):
        log_p = jnp.maximum(-jax.nn.softplus(-z), -100.0)
        log_1mp = jnp.maximum(-jax.nn.softplus(z), -100.0)
        return jnp.sum(-(t * log_p + (1 - t) * log_1mp))

    t = jnp.array([1.0, 0.0, 1.0, 0.0])
    for z in (jnp.array([500.0, -500.0, -500.0, 500.0]),  # worst-case wrong
              jnp.array([50.0, -50.0, 30.0, -80.0])):
        val, g = jax.value_and_grad(loss)(z, t)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))
    # forward parity with the clamped naive form where it is well-defined
    z = jnp.array([-3.0, 0.5, 2.0, -1.0])
    p = jax.nn.sigmoid(z)
    naive = jnp.sum(-(t * jnp.clip(jnp.log(p), -100.0)
                      + (1 - t) * jnp.clip(jnp.log1p(-p), -100.0)))
    np.testing.assert_allclose(float(loss(z, t)), float(naive), rtol=1e-6)

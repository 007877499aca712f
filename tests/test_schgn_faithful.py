"""SCHGN faithful-interleave mode (config `schgn_faithful_interleave`):
reproduces the reference's `.view(b, -1)` component-attention score mixing
(reference schgn.py:186-206) so the deliberate fix can be A/B'd.

The numpy oracle below is a literal transcription of the reference's
`attention_id_ingre_image`: scores computed on the component-major [4B, 2d]
concat, the [4B, 1] output re-read row-major as [B, 4]."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import make_config


def _build(synth_root, faithful):
    from foodrec_tpu.data.dataset import FoodData
    from foodrec_tpu.data.device import DeviceData
    from foodrec_tpu.models import get_model

    cfg, _ = make_config(synth_root, model="SCHGN", overrides={
        "schgn_faithful_interleave": faithful})
    data = FoodData(cfg)
    data.device_data = DeviceData.from_food_data(data, cfg)
    return get_model("SCHGN")(cfg, data)


def _reference_component_attention(params, u, i, g, m, h):
    """Literal reference semantics (schgn.py:186-206) in numpy."""
    b = u.shape[0]
    cp = np.concatenate([np.concatenate([u, c], axis=1)
                         for c in (i, g, m, h)], axis=0)      # [4B, 2d]
    hid = np.tanh(cp @ np.asarray(params["W_att_comp"]["w"])
                  + np.asarray(params["W_att_comp"]["b"]))
    mlp = (hid @ np.asarray(params["h_att_comp"]["w"])).reshape(b, -1)
    e = np.exp(mlp - mlp.max(axis=1, keepdims=True))
    w = (e / e.sum(axis=1, keepdims=True))[..., None]          # [B, 4, 1]
    ce = np.stack([i, g, m, h], axis=1)                        # [B, 4, d]
    return np.sum(w * ce, axis=1)


def test_faithful_matches_reference_formula(synth_root, rng):
    model = _build(synth_root, True)
    params = model.init_params(jax.random.PRNGKey(3))
    d = model.embedding_size
    b = 7  # not a multiple of 4: exercises the cross-sample scramble fully
    u, i, g, m, h = (rng.normal(size=(b, d)).astype(np.float32)
                     for _ in range(5))
    ours = np.asarray(model._attention_component_level(
        params, jnp.asarray(u), jnp.asarray(i), jnp.asarray(g),
        jnp.asarray(m), jnp.asarray(h)))
    ref = _reference_component_attention(params, u, i, g, m, h)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_fixed_mode_differs_and_is_per_sample(synth_root, rng):
    """The default (fixed) mode is sample-local: permuting the batch permutes
    the output; faithful mode is NOT sample-local (that is the bug)."""
    fixed = _build(synth_root, False)
    faith = _build(synth_root, True)
    assert not fixed.faithful_interleave and faith.faithful_interleave
    params = fixed.init_params(jax.random.PRNGKey(3))
    d = fixed.embedding_size
    b = 8
    args = [rng.normal(size=(b, d)).astype(np.float32) for _ in range(5)]
    ja = [jnp.asarray(a) for a in args]
    out_fixed = np.asarray(fixed._attention_component_level(params, *ja))
    out_faith = np.asarray(faith._attention_component_level(params, *ja))
    assert np.abs(out_fixed - out_faith).max() > 1e-4

    perm = rng.permutation(b)
    out_fixed_p = np.asarray(fixed._attention_component_level(
        params, *[jnp.asarray(a[perm]) for a in args]))
    np.testing.assert_allclose(out_fixed_p, out_fixed[perm], rtol=1e-5,
                               atol=1e-6)


def test_faithful_eval_flatten_matches_blockwise_flat_call(synth_root, rng):
    """score_from_cache on a [U, C] candidate block must equal scoring the
    user-major flattened batch (the layout torch_score_by_user feeds the
    reference) — i.e. our 2-D leading-dim flatten order is the harness's."""
    model = _build(synth_root, True)
    params = model.init_params(jax.random.PRNGKey(5))
    cache = model.eval_cache(params)
    users = jnp.asarray(np.array([0, 1, 2], np.int32))
    cand = jnp.asarray(rng.integers(0, model.n_items, size=(3, 6))
                       .astype(np.int32))
    blocked = np.asarray(model.score_from_cache(params, cache, users, cand))
    flat_u = jnp.repeat(users, 6)
    flat_c = cand.reshape(-1)
    flat = np.asarray(model._score(params, cache, flat_u, flat_c, False))
    np.testing.assert_allclose(blocked.reshape(-1), flat, rtol=1e-5,
                               atol=1e-6)

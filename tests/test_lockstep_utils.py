"""Unit tests for lockstep_check.py's pure plumbing: pytree flatten/round-
trip (the init/param transport between the torch recording and our replay)
and the artifact-suffix encoding of the decomposition axes. A silent break
here corrupts at-scale lockstep artifacts rather than failing loudly, so
these stay pinned in CI.
"""

import argparse

import numpy as np

import lockstep_check as lc


def _args(**kw):
    base = dict(model="LightGCN", side="ours", scale="foodcom", epochs=15,
                seed=999, perturb=0.0, precision="highest",
                init_mode="torch", init_key=None, stream="replay",
                stream_key=0)
    base.update(kw)
    return argparse.Namespace(**base)


def test_flatten_roundtrip_nested():
    tree = {
        "emb": np.arange(6.0).reshape(2, 3),
        "mlp": {"w": np.ones((3, 2)), "b": np.zeros((2,))},
        "layers": [{"g": np.full((4,), 2.0)}, {"g": np.full((4,), 3.0)}],
    }
    flat = lc.flatten_tree(tree)
    assert set(flat) == {"emb", "mlp/w", "mlp/b", "layers/0/g", "layers/1/g"}
    rebuilt = lc.unflatten_like(tree, flat)
    for k, v in lc.flatten_tree(rebuilt).items():
        np.testing.assert_array_equal(v, flat[k])
    assert isinstance(rebuilt["layers"], list)


def test_unflatten_shape_mismatch_raises():
    tree = {"emb": np.zeros((2, 3))}
    flat = {"emb": np.zeros((3, 2))}
    try:
        lc.unflatten_like(tree, flat)
    except AssertionError as e:
        assert "emb" in str(e)
    else:
        raise AssertionError("shape mismatch must not pass silently")


def test_sfx_encodes_each_axis_once():
    assert lc._sfx(_args()) == ""
    assert lc._sfx(_args(perturb=1e-6)) == "_p1e-06"
    assert lc._sfx(_args(precision="default")) == "_prec-default"
    assert lc._sfx(_args(init_mode="ours")) == "_init-ours"
    # explicit init_key equal to the seed adds nothing; a different one does
    assert lc._sfx(_args(init_mode="ours", init_key=999)) == "_init-ours"
    assert lc._sfx(_args(init_mode="ours", init_key=7)) == "_init-ours7"
    assert lc._sfx(_args(stream="native", stream_key=2)) == "_native2"
    combined = lc._sfx(_args(perturb=1e-6, precision="default",
                             init_mode="ours", stream="native"))
    assert combined == "_p1e-06_prec-default_init-ours_native0"


def test_run_tag_names_the_recording_dir():
    assert lc.run_tag(_args()) == "LightGCN_foodcom_999_15ep"


def test_ours_stream_key_varies_with_seed():
    """Protocol v2: the device sampler stream must be seed-derived AND
    distinct from the init draw. v1 pinned it to PRNGKey(0) for every
    seed, correlating all 'independent' ours-side parity runs through one
    shared stream draw (the torch side varies its sampler with the seed,
    dataloader.py:145-151) — the stream axis alone scatters +-0.4% NDCG@20
    at Foodcom scale, enough to bias a whole multi-seed mean."""
    import jax

    import parity_check as pc

    k998, k999 = pc.ours_stream_key(998), pc.ours_stream_key(999)
    assert not np.array_equal(np.asarray(k998), np.asarray(k999))
    # distinct from the init key for the same seed
    assert not np.array_equal(np.asarray(k999),
                              np.asarray(jax.random.PRNGKey(999)))

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env before jax is imported anywhere (SURVEY.md §4d: the standard
JAX substitute for multi-chip testing without a real slice).
"""

import os

# force-override: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel (axon) and a sitecustomize imports jax at interpreter start, so env
# vars alone are too late — use jax.config after import as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    """A synthetic dataset on disk following the reference contract."""
    from foodrec_tpu.data import synthetic

    root = tmp_path_factory.mktemp("datasets") / "Synth"
    meta = synthetic.generate(str(root))
    return str(root), meta


def make_config(synth_root, model="LightGCN", overrides=None):
    from foodrec_tpu.config import Config
    from foodrec_tpu.data.dataset import derive_data_paths

    root, meta = synth_root
    cfg = Config(model=model, dataset="Synth",
                 config_dict={"data_path": root.rsplit("/Synth", 1)[0] + "/",
                              "neg_sample_num": meta["neg_num"],
                              **(overrides or {})})
    derive_data_paths(cfg, "Synth")
    return cfg, meta


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)

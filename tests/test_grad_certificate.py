"""Pin the f64 gradient-identity certificate at toy scale for the flagship.

tools/grad_certificate.py is the deterministic at-scale parity anchor (see
its module docstring); this test keeps its machinery honest in CI: param
mapping, f64 promotion on both sides, and the <=1e-9 gradient identity for
CIKM_Model. A regression here means either a model-math change broke torch
parity or an f32 constant crept back into a certified path (the two failure
classes the certificate exists to catch).
"""

import os
import subprocess
import sys

import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cikm_gradient_certificate_toy(tmp_path):
    # subprocess: JAX_ENABLE_X64 must be set before jax configures itself,
    # and the test session's CPU-mesh jax is already initialized
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "JAX_ENABLE_X64": "True",
                "OMP_NUM_THREADS": "1"})
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "tools/grad_certificate.py", "--model", "CIKM_Model",
         "--scale", "toy", "--batch", "64"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "pass_1e-9=True" in out.stdout, out.stdout[-2000:]

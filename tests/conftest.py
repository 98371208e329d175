"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test process,
hence this sits at the top of conftest and tests never import jax at module
scope before pytest loads us.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# In this environment the JAX_PLATFORMS env var is overridden by the TPU
# plugin, so force the platform through the config API instead.
# NEURALBARK_TEST_TPU=1 opts out, to run TPU-only tests (e.g.
# test_pallas_kernels.py::test_fused_dropout_matmul_tpu) on real
# hardware — select those tests explicitly; the mesh-of-8 tests need
# the CPU platform.
import jax

if os.environ.get("NEURALBARK_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu" and jax.device_count() == 8

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)

"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

Multi-chip sharding paths are exercised on the virtual CPU mesh (the driver
separately dry-runs them); numerics parity tests need float64, which TPU lacks
natively, so the suite pins the cpu backend. Note: this environment preloads
jax via sitecustomize, so we must use jax.config.update rather than env vars.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(52)

"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

Multi-chip sharding paths are exercised on the virtual CPU mesh (the driver
separately dry-runs them); numerics parity tests need float64, which TPU lacks
natively, so the suite pins the cpu backend. Note: this environment preloads
jax via sitecustomize, so we must use jax.config.update rather than env vars.

Setting ``FBT_TPU_SMOKE=1`` skips the cpu/x64 pin so the ``-m tpu_smoke``
subset (tests/test_tpu_smoke.py — float32-only, float-only jit surfaces) can
run on whatever accelerator backend is active, e.g.
``FBT_TPU_SMOKE=1 pytest tests -m tpu_smoke`` on the TPU chip. The rest of
the suite needs x64 and is not expected to pass in that mode.
"""
import os

_TPU_SMOKE = os.environ.get("FBT_TPU_SMOKE") == "1"

if not _TPU_SMOKE:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not _TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(52)

"""Test config: run on CPU with 8 virtual devices so sharding/collective tests
can exercise the multi-chip code paths without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# XLA CPU's default matmul precision is reduced; parity tests vs torch fp32
# need exact fp32 contractions (TPU benchmarks never run under pytest)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

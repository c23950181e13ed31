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

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU
# plugin in EVERY python process and sets jax_platforms="axon,cpu", silently
# overriding the JAX_PLATFORMS env var — tests would then run single-device
# on the tunnelled TPU (breaking the 8-virtual-device sharding tests and
# wedging the one-client-at-a-time tunnel). Forcing the config here wins over
# the sitecustomize because backends initialise lazily on first use.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"({jax.devices()[:2]}) — sharding tests need them"
)

# XLA CPU's default matmul precision is reduced; parity tests vs torch fp32
# need exact fp32 contractions (TPU benchmarks never run under pytest)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight end-to-end drives (CLI subprocess roundtrips); "
        "deselect with -m 'not slow' for a quick pass",
    )

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


@pytest.fixture(scope="session", autouse=True)
def fresh_native_build(tmp_path_factory):
    """Build the native loader from the current source into a TEMP dir and
    point the binding at it for the whole session.

    Session-scoped in conftest (not module-scoped in test_native_loader.py)
    so that ANY subset invocation — e.g. `pytest tests/test_kd_and_cc3m.py`
    alone — sees a fresh library instead of silently skipping on a stale
    checked-in .so (equal mtimes after checkout defeat make's dependency
    check; 3 silent skips observed in round 3). Building into a temp dir
    keeps the git-tracked binary clean. No toolchain => fall through to the
    checked-in library (the ABI guard still protects such machines)."""
    import pathlib
    import shutil
    import subprocess

    import bcosification_tpu.data.native_loader as nl

    native_dir = pathlib.Path(__file__).parents[1] / "native"
    build_dir = pathlib.Path(tmp_path_factory.mktemp("native_build"))
    fresh = None
    try:
        for f in ("Makefile", "bcos_loader.cpp"):
            shutil.copy(native_dir / f, build_dir / f)
        subprocess.run(
            ["make", "-B", "-C", str(build_dir)],
            check=True, capture_output=True, timeout=120,
        )
        candidate = build_dir / "libbcos_loader.so"
        if candidate.exists():
            fresh = candidate
    except (OSError, subprocess.SubprocessError):
        pass  # no toolchain: fall through to the checked-in library
    old_paths, old_lib = nl._LIB_PATHS, nl._lib
    if fresh is not None:
        nl._LIB_PATHS = [fresh]
    nl._lib = None
    yield
    nl._LIB_PATHS, nl._lib = old_paths, old_lib


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight end-to-end drives (CLI subprocess roundtrips); "
        "deselect with -m 'not slow' for a quick pass",
    )

"""BCOS_PLATFORM CLI knob (utils/platform.py) — parsing and application."""
import pytest

from bcosification_tpu.utils import platform as plat


def test_unset_is_noop(monkeypatch):
    monkeypatch.delenv("BCOS_PLATFORM", raising=False)
    plat.apply_platform_env()  # must not touch jax.config


def test_auto_is_noop(monkeypatch):
    monkeypatch.setenv("BCOS_PLATFORM", "auto")
    plat.apply_platform_env()


def test_bad_value_fails_loudly(monkeypatch):
    monkeypatch.setenv("BCOS_PLATFORM", "gpu")
    with pytest.raises(SystemExit, match="gpu"):
        plat.apply_platform_env()


def test_cpu_applies(monkeypatch):
    import jax

    monkeypatch.setenv("BCOS_PLATFORM", "cpu")
    before = jax.config.jax_platforms
    try:
        plat.apply_platform_env()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", before)

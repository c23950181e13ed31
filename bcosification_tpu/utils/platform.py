"""Platform selection for CLI entry points.

On axon-tunneled machines the sitecustomize registers the TPU plugin in every
python process and silently overrides the JAX_PLATFORMS env var (CLAUDE.md),
so a CLI that merely imports jax grabs the single-client TPU. ``BCOS_PLATFORM``
gives CLIs an override that actually works: it is applied via
``jax.config.update`` (which wins over the sitecustomize) before any backend
initialises.

  BCOS_PLATFORM=cpu   force CPU (safe while another process owns the TPU)
  BCOS_PLATFORM=tpu   force the TPU plugin
  unset / auto        JAX default (TPU when available)
"""
from __future__ import annotations

import os

__all__ = ["apply_platform_env"]

_PLATFORM_MAP = {"tpu": "axon,cpu", "cpu": "cpu"}


def apply_platform_env() -> None:
    """Apply BCOS_PLATFORM, if set. Call first thing in CLI main()s, before
    any jax computation (backends initialise lazily on first use)."""
    choice = os.getenv("BCOS_PLATFORM", "").strip().lower()
    if not choice or choice == "auto":
        return
    if choice not in _PLATFORM_MAP and choice != "axon":
        raise SystemExit(
            f"BCOS_PLATFORM={choice!r} not understood (use cpu, tpu or auto)"
        )
    import jax

    jax.config.update("jax_platforms", _PLATFORM_MAP.get(choice, choice))

"""Containers that thread the (train, explain) static flags through children.

`BcosSequential` parity: `/root/reference/bcos/modules/common.py:37-51`. Since
linen modules are pure, the reference's `DetachableModule.set_explanation_mode`
walk (`/root/reference/bcos/common.py:347-384`) is unnecessary — the flags are
call arguments.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Sequence, Tuple

from flax import linen as nn

__all__ = ["BcosSequential", "call_with_flags"]


def call_with_flags(layer: Callable, x, *, train: bool, explain: bool, **kw):
    """Call a layer, passing train/explain only if its signature accepts them
    (lets plain functions like jnp ops participate in Sequential chains)."""
    if isinstance(layer, nn.Module):
        return layer(x, train=train, explain=explain, **kw)
    try:
        sig = inspect.signature(layer)
        kwargs = {}
        if "train" in sig.parameters:
            kwargs["train"] = train
        if "explain" in sig.parameters:
            kwargs["explain"] = explain
        return layer(x, **kwargs, **kw)
    except (ValueError, TypeError):
        return layer(x)


class BcosSequential(nn.Module):
    """Sequential container forwarding train/explain flags."""

    layers: Tuple[Any, ...]

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        for layer in self.layers:
            x = call_with_flags(layer, x, train=train, explain=explain)
        return x

"""Abstract-initialisation mode for model factories.

The pretrained-entrypoint registry (models/pretrained.py) and the experiment
model factories materialise real parameter trees with ``jax.jit(model.init)``.
Conversion tooling (bcosify/release_import.py) and structural tests only need
the tree's SHAPE — initialising a ViT-L for the sole purpose of overwriting
every leaf wastes minutes on a 1-core host. Inside the ``abstract_init()``
context every factory that routes through :func:`initialize` returns an
``eval_shape``'d tree of ``jax.ShapeDtypeStruct`` leaves instead.

The flag is thread-local so a conversion running in a worker thread cannot
flip a concurrently-initialising trainer into abstract mode.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager

import jax

__all__ = ["abstract_init", "abstract_init_on", "initialize"]

_STATE = threading.local()


@contextmanager
def abstract_init():
    """Within this context, :func:`initialize` eval_shapes instead of inits."""
    prev = getattr(_STATE, "on", False)
    _STATE.on = True
    try:
        yield
    finally:
        _STATE.on = prev


def abstract_init_on() -> bool:
    return getattr(_STATE, "on", False)


def initialize(model, rng, x0):
    """``model.init`` honouring :func:`abstract_init` (jitted otherwise —
    eager TPU dispatch is pathologically slow through the axon tunnel)."""
    if abstract_init_on():
        return jax.eval_shape(model.init, rng, x0)
    return jax.jit(model.init)(rng, x0)

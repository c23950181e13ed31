"""Guided-backprop ReLU gating.

Parity target: the reference registry ships captum ``GuidedBackprop``
(`/root/reference/interpretability/explanation_methods/explainers/__init__.py:62-85`,
`explainers/captum.py`): the forward pass is unchanged, but at every ReLU the
backward pass keeps only POSITIVE gradients flowing through POSITIVELY
activated units. Bcosified CNNs keep their ReLUs (``act_layer: True`` in the
flagship config, ref `bcosify.py:110-114`), so GB differs from plain Grad on
exactly the models the localisation analysis compares explainers on.

JAX design: captum swaps the ReLU autograd node via module hooks; here the
model's ReLU call sites route through :func:`relu` below, which checks a
trace-time context flag. The GuidedBackprop explainer enters
:func:`guided_backprop` *inside* its traced function, so whenever (and
however often) JAX traces it, the guided VJP is baked into that graph while
every other trace in the process sees the ordinary ReLU.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

__all__ = ["relu", "guided_backprop", "guided_mode"]

_GUIDED = contextvars.ContextVar("bcos_guided_backprop", default=False)


def guided_mode() -> bool:
    """True while tracing under :func:`guided_backprop`."""
    return _GUIDED.get()


@contextlib.contextmanager
def guided_backprop():
    token = _GUIDED.set(True)
    try:
        yield
    finally:
        _GUIDED.reset(token)


@jax.custom_vjp
def _guided_relu(x):
    return jnp.maximum(x, 0)


def _guided_relu_fwd(x):
    return jnp.maximum(x, 0), x > 0


def _guided_relu_bwd(pos_input, g):
    return (jnp.where(pos_input & (g > 0), g, jnp.zeros_like(g)),)


_guided_relu.defvjp(_guided_relu_fwd, _guided_relu_bwd)


def relu(x):
    """Model-path ReLU: ordinary ReLU normally; guided-VJP ReLU while a
    GuidedBackprop trace is active. Values are identical either way — only
    the gradient differs."""
    if _GUIDED.get():
        return _guided_relu(x)
    return jnp.maximum(x, 0)

"""Guided-backprop and DeepLIFT ReLU gating.

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

__all__ = [
    "relu",
    "guided_backprop",
    "guided_mode",
    "deeplift",
    "deeplift_mode",
]

_GUIDED = contextvars.ContextVar("bcos_guided_backprop", default=False)
_DEEPLIFT = contextvars.ContextVar("bcos_deeplift", default=False)


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


def deeplift_mode() -> bool:
    """True while tracing under :func:`deeplift`."""
    return _DEEPLIFT.get()


@contextlib.contextmanager
def deeplift():
    """DeepLIFT (Rescale rule) trace context.

    Parity target: the reference registry's captum ``DeepLift``
    (`/root/reference/interpretability/explanation_methods/explainers/
    __init__.py:62-85`, captum-gated there; implemented natively here).

    Contract: inside this context the model must be applied to a PAIRED
    batch ``concat([x, x0])`` (actual inputs stacked over their baselines,
    equal halves). Every ReLU call-site then backpropagates the Rescale
    multiplier m = (relu(x) - relu(x0)) / (x - x0) for BOTH halves of the
    pair (captum's Rescale semantics), falling back to the ordinary gradient
    where |x - x0| is ~0. All other ops in a B-cos explanation-mode forward
    are linear, so DeepLIFT's chain of multipliers is exact and the
    attributions (x - x0) * grad satisfy summation-to-delta:
    sum(attr) == f(x) - f(x0).
    """
    token = _DEEPLIFT.set(True)
    try:
        yield
    finally:
        _DEEPLIFT.reset(token)


@jax.custom_vjp
def _deeplift_relu(x):
    return jnp.maximum(x, 0)


def _deeplift_relu_fwd(x):
    return jnp.maximum(x, 0), x


def _deeplift_relu_bwd(x, g):
    half = x.shape[0] // 2
    xa, xr = x[:half], x[half:]
    delta = xa - xr
    near = jnp.abs(delta) < 1e-7
    m = jnp.where(
        near,
        # degenerate pair: ordinary relu gradient at the actual input
        (xa > 0).astype(x.dtype),
        (jnp.maximum(xa, 0) - jnp.maximum(xr, 0)) / jnp.where(near, 1, delta),
    )
    mm = jnp.concatenate([m, m], axis=0)
    return (g * mm,)


_deeplift_relu.defvjp(_deeplift_relu_fwd, _deeplift_relu_bwd)


def relu(x):
    """Model-path ReLU: ordinary ReLU normally; guided-VJP ReLU while a
    GuidedBackprop trace is active; paired-rescale VJP under DeepLIFT.
    Values are identical in every mode — only the gradient differs."""
    if _GUIDED.get():
        return _guided_relu(x)
    if _DEEPLIFT.get():
        return _deeplift_relu(x)
    return jnp.maximum(x, 0)

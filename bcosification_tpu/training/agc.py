"""Adaptive Gradient Clipping (NFNets, arXiv 2102.06171) as an optax transform.

Parity target: `/root/reference/bcos/training/agc.py:28-54`. Unit-wise norms:
the torch code computes per-output-unit norms over OIHW dims (1,2,3) / Linear
dim 1; our layouts are HWIO / (in, out), so the unit (output) axis is the LAST
axis — norms reduce over all axes but the last. <=1D params use the full norm.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["unitwise_norm", "adaptive_clip_grads", "adaptive_grad_clip"]


def unitwise_norm(x: jax.Array) -> jax.Array:
    squeezed_ndim = sum(1 for s in x.shape if s > 1)
    if squeezed_ndim <= 1:
        return jnp.linalg.norm(x.reshape(-1))
    axes = tuple(range(x.ndim - 1))  # all but the output (last) axis
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axes, keepdims=True))


def _clip_one(p: jax.Array, g: jax.Array, clip_factor: float, eps: float) -> jax.Array:
    max_norm = jnp.clip(unitwise_norm(p), eps, None) * clip_factor
    grad_norm = unitwise_norm(g)
    clipped = g * (max_norm / jnp.clip(grad_norm, 1e-6, None))
    return jnp.where(grad_norm < max_norm, g, clipped)


def adaptive_clip_grads(params, grads, clip_factor: float = 0.01, eps: float = 1e-3):
    return jax.tree_util.tree_map(
        lambda p, g: _clip_one(p, g, clip_factor, eps), params, grads
    )


def adaptive_grad_clip(
    clip_factor: float = 0.01, eps: float = 1e-3
) -> optax.GradientTransformation:
    """optax transform: clip each unit's gradient to clip_factor * ||param||."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adaptive_grad_clip requires params")
        return adaptive_clip_grads(params, updates, clip_factor, eps), state

    return optax.GradientTransformation(init_fn, update_fn)

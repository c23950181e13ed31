"""Stochastic depth (row-wise DropPath), parity with the vendored torchvision
implementation in `/root/reference/bcos/modules/stochastic_depth.py`."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["StochasticDepth", "stochastic_depth"]


def stochastic_depth(rng, x, p: float, mode: str, training: bool = True):
    if p < 0.0 or p > 1.0:
        raise ValueError(f"drop probability must be in [0, 1], got {p}")
    if mode not in ("batch", "row"):
        raise ValueError(f"mode must be 'batch' or 'row', got {mode}")
    if not training or p == 0.0:
        return x
    survival_rate = 1.0 - p
    if mode == "row":
        size = (x.shape[0],) + (1,) * (x.ndim - 1)
    else:
        size = (1,) * x.ndim
    noise = jax.random.bernoulli(rng, survival_rate, size).astype(x.dtype)
    if survival_rate > 0.0:
        noise = noise / survival_rate
    return x * noise


class StochasticDepth(nn.Module):
    p: float
    mode: str = "row"

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        if not train or self.p == 0.0:
            return x
        rng = self.make_rng("dropout")
        return stochastic_depth(rng, x, self.p, self.mode, training=True)

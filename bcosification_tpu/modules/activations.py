"""Detachable activations.

`DetachableGELU` (the reference's `MyGELU`, `/root/reference/bcosify_vit.py:27-32`,
duplicated at `/root/reference/bcos/experiments/ImageNet/vit_bcosification/
experiment_parameters.py:96-102`): GELU written as ``gate(x) * x`` with
``gate = x -> GELU(x)/x`` detached in explanation mode so the activation is
dynamic-linear. We use the equivalent explicit gate Phi-form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DetachableGELU", "MyGELU", "PlainGELU", "ReLU", "Identity"]


class DetachableGELU(nn.Module):
    """gate * x with gate = GELU(x)/x = 0.5*(1+erf(x/sqrt(2))); the gate is
    stop-gradiented in explanation mode, making GELU a dynamic-linear op.
    ``detachable=False`` gives the reference's plain nn.GELU (standard
    non-B-cos ViT configs): same forward, no explanation-mode detach."""

    approximate: bool = False
    detachable: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        if self.approximate:
            gate = 0.5 * (
                1.0 + jnp.tanh(jnp.sqrt(2 / jnp.pi) * (x + 0.044715 * x**3))
            )
        else:
            gate = 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))
        if explain and self.detachable:
            gate = jax.lax.stop_gradient(gate)
        return gate * x


MyGELU = DetachableGELU  # reference name


def PlainGELU(**kwargs):
    """The reference's plain nn.GELU (vit_final standard configs)."""
    return DetachableGELU(detachable=False, **kwargs)


class ReLU(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        # routed through ops.guided so GuidedBackprop can gate the VJP
        from bcosification_tpu.ops import guided

        return guided.relu(x)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        return x

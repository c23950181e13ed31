"""BcosifyNetwork — the conversion wrapper around a (bcosified) backbone.

Parity target: `/root/reference/bcosify.py:22-53`.

Adds (1) the 0th-layer channel-wise Normalize over the 6 AddInverse channels
(IMAGENET / CLIP / zero-mean variants, bcosify.py:15-43), and (2) an optional
LogitLayer with bias -log(N-1) (bcosify.py:29-31).

DOCUMENTED DEVIATION: the reference hardcodes ``-math.log(1000 - 1)``
regardless of the model's class count (bcosify.py:31); this wrapper uses
``-log(num_classes - 1)`` — identical for every 1000-class ImageNet model
(all release checkpoints and all exactness oracles), and the uniform-prior
log-odds the constant was *meant* to be for other class counts. Pass
``logit_bias=-math.log(999)`` to reproduce the reference bit-for-bit on a
non-1000-class model. The module-tree rewrite part
of the reference's BcosifyNetwork (Conv2d->BcosifyConv2d etc., bcosify.py:55-
114) is architecture re-parameterisation + a pure parameter transform here —
see `bcosification_tpu.bcosify`.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.modules import LogitLayer

__all__ = [
    "BcosifyNetwork",
    "Normalize",
    "IMAGENET_MEAN_ADDINVERSE",
    "IMAGENET_STD_ADDINVERSE",
    "CLIP_MEAN_ADDINVERSE",
    "CLIP_MEAN_ZERO",
    "CLIP_STD_ADDINVERSE",
]

# bcosify.py:15-20
IMAGENET_MEAN_ADDINVERSE = (0.485, 0.456, 0.406, 0.515, 0.544, 0.594)
IMAGENET_STD_ADDINVERSE = (0.229, 0.224, 0.225, 0.229, 0.224, 0.225)
CLIP_MEAN_ADDINVERSE = (
    0.48145466, 0.4578275, 0.40821073, 0.51854534, 0.5421725, 0.59178927,
)
CLIP_MEAN_ZERO = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
CLIP_STD_ADDINVERSE = (
    0.26862954, 0.26130258, 0.27577711, 0.26862954, 0.26130258, 0.27577711,
)


class Normalize(nn.Module):
    """Channel-wise (x - mean)/std on the last axis (torchvision
    transforms.Normalize as an on-device op — trivially fused by XLA into the
    first conv)."""

    mean: Tuple[float, ...]
    std: Tuple[float, ...]

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        mean = jnp.asarray(self.mean, x.dtype)
        std = jnp.asarray(self.std, x.dtype)
        return (x - mean) / std


def normalization_for(
    clip_kd: bool = False, linearprobe_clip: bool = False, bfy_mean_zero: bool = False
) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Pick the 0th-layer normalisation constants (bcosify.py:38-43)."""
    if clip_kd and bfy_mean_zero:
        return CLIP_MEAN_ZERO, CLIP_STD_ADDINVERSE
    if (clip_kd or linearprobe_clip) and not bfy_mean_zero:
        return CLIP_MEAN_ADDINVERSE, CLIP_STD_ADDINVERSE
    return IMAGENET_MEAN_ADDINVERSE, IMAGENET_STD_ADDINVERSE


class BcosifyNetwork(nn.Module):
    """normalize -> backbone -> (logit layer). The backbone is any linen module
    taking (x, train=, explain=)."""

    model: nn.Module
    num_classes: int = 1000
    with_logit_layer: bool = True
    mean: Tuple[float, ...] = IMAGENET_MEAN_ADDINVERSE
    std: Tuple[float, ...] = IMAGENET_STD_ADDINVERSE
    logit_bias: Optional[float] = None
    logit_temperature: Optional[float] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        x = Normalize(self.mean, self.std, name="bcosifynormalize")(x)
        x = self.model(x, train=train, explain=explain)
        if self.with_logit_layer:
            bias = (
                -math.log(self.num_classes - 1)
                if self.logit_bias is None
                else self.logit_bias
            )
            x = LogitLayer(self.logit_temperature, bias, name="logit_layer")(x)
        return x

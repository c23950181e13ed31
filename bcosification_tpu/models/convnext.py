"""B-cos ConvNeXt family (NHWC, flax.linen).

Parity target: `/root/reference/bcos/models/convnext.py`: CNBlocks with
depthwise 7x7 + norm + 1x1 expand/project (GELU removed — the B-cos transform
is non-linear), layer scale, stochastic depth; 4x4 patchify stem; norm+conv
downsampling between stages; norm + 1x1-conv classifier applied BEFORE global
average pooling; LogitLayer.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.modules import BcosConv2d, LogitLayer, StochasticDepth, norms
from bcosification_tpu.ops import pooling

__all__ = [
    "CNBlockConfig",
    "BcosConvNeXt",
    "convnext_atto",
    "convnext_tiny",
    "convnext_small",
    "convnext_base",
    "convnext_large",
]

DEFAULT_CONV_LAYER = BcosConv2d
DEFAULT_NORM_LAYER = norms.NoBias(norms.DetachablePositionNorm2d)


@dataclasses.dataclass(frozen=True)
class CNBlockConfig:
    input_channels: int
    out_channels: Optional[int]
    num_layers: int


class CNBlock(nn.Module):
    """convnext.py:32-67."""

    dim: int
    layer_scale: float
    stochastic_depth_prob: float
    conv_layer: Callable = DEFAULT_CONV_LAYER
    norm_layer: Callable = DEFAULT_NORM_LAYER

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        h = self.conv_layer(
            self.dim, kernel_size=7, padding=3, groups=self.dim, name="block_0"
        )(x, **f)
        h = self.norm_layer(self.dim, name="block_1")(h, **f)
        h = self.conv_layer(4 * self.dim, kernel_size=1, name="block_2")(h, **f)
        h = self.conv_layer(self.dim, kernel_size=1, name="block_3")(h, **f)
        scale = self.param(
            "layer_scale",
            nn.initializers.constant(self.layer_scale),
            (self.dim,),
        )
        h = h * scale
        if self.stochastic_depth_prob:
            h = StochasticDepth(self.stochastic_depth_prob, "row", name="sd")(h, **f)
        return h + x


class BcosConvNeXt(nn.Module):
    """convnext.py:89-216."""

    block_setting: Sequence[CNBlockConfig]
    stochastic_depth_prob: float = 0.0
    layer_scale: float = 1e-6
    num_classes: int = 1000
    conv_layer: Callable = DEFAULT_CONV_LAYER
    norm_layer: Callable = DEFAULT_NORM_LAYER
    logit_bias: Optional[float] = None
    logit_temperature: Optional[float] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        first = self.block_setting[0].input_channels
        x = self.conv_layer(first, kernel_size=4, stride=4, name="stem_conv")(x, **f)
        x = self.norm_layer(first, name="stem_norm")(x, **f)

        total = sum(c.num_layers for c in self.block_setting)
        block_id = 0
        for si, cnf in enumerate(self.block_setting):
            for bi in range(cnf.num_layers):
                sd = self.stochastic_depth_prob * block_id / max(total - 1.0, 1.0)
                x = CNBlock(
                    cnf.input_channels,
                    self.layer_scale,
                    sd,
                    self.conv_layer,
                    self.norm_layer,
                    name=f"stage{si}_block{bi}",
                )(x, **f)
                block_id += 1
            if cnf.out_channels is not None:
                x = self.norm_layer(cnf.input_channels, name=f"down{si}_norm")(x, **f)
                x = self.conv_layer(
                    cnf.out_channels, kernel_size=2, stride=2, name=f"down{si}_conv"
                )(x, **f)

        last = self.block_setting[-1]
        last_ch = last.out_channels or last.input_channels
        # classifier before GAP (convnext.py:184-211)
        x = self.norm_layer(last_ch, name="classifier_norm")(x, **f)
        x = self.conv_layer(self.num_classes, kernel_size=1, name="classifier_conv")(
            x, **f
        )
        x = pooling.global_avg_pool(x)
        bias = (
            -math.log(self.num_classes - 1)
            if self.logit_bias is None
            else self.logit_bias
        )
        return LogitLayer(self.logit_temperature, bias, name="logit_layer")(x, **f)


def _entry(block_setting, sd):
    def factory(**kwargs):
        kwargs.setdefault("stochastic_depth_prob", sd)
        return BcosConvNeXt(block_setting=tuple(block_setting), **kwargs)

    return factory


convnext_atto = _entry(
    [
        CNBlockConfig(40, 80, 2),
        CNBlockConfig(80, 160, 2),
        CNBlockConfig(160, 320, 6),
        CNBlockConfig(320, None, 2),
    ],
    0.1,
)
convnext_tiny = _entry(
    [
        CNBlockConfig(96, 192, 3),
        CNBlockConfig(192, 384, 3),
        CNBlockConfig(384, 768, 9),
        CNBlockConfig(768, None, 3),
    ],
    0.1,
)
convnext_small = _entry(
    [
        CNBlockConfig(96, 192, 3),
        CNBlockConfig(192, 384, 3),
        CNBlockConfig(384, 768, 27),
        CNBlockConfig(768, None, 3),
    ],
    0.4,
)
convnext_base = _entry(
    [
        CNBlockConfig(128, 256, 3),
        CNBlockConfig(256, 512, 3),
        CNBlockConfig(512, 1024, 27),
        CNBlockConfig(1024, None, 3),
    ],
    0.5,
)
convnext_large = _entry(
    [
        CNBlockConfig(192, 384, 3),
        CNBlockConfig(384, 768, 3),
        CNBlockConfig(768, 1536, 27),
        CNBlockConfig(1536, None, 3),
    ],
    0.5,
)

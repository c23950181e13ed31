"""B-cos DenseNet family (NHWC, flax.linen).

Covers both the from-scratch B-cos DenseNet
(`/root/reference/bcos/models/densenet.py`, classifier-as-conv before GAP at
:332-344) and the bcosified torchvision `DenseNetBcos`
(`/root/reference/bcos/models/standard_models.py:56-63` + bcosify rewrite):
conv_layer/norm_layer/act_layer factories select the variant. Sub-module
names mirror torchvision's state_dict scheme (features.conv0, denseblockI.
denselayerJ.{norm1,conv1,norm2,conv2}, transitionI.{norm,conv}, norm5,
classifier) for mechanical weight import.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.models.resnet import (
    DEFAULT_ACT_LAYER,
    DEFAULT_CONV_LAYER,
    DEFAULT_NORM_LAYER,
)
from bcosification_tpu.modules import LogitLayer
from bcosification_tpu.ops import pooling

__all__ = ["BcosDenseNet", "densenet121", "densenet161", "densenet169", "densenet201"]


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    norm_layer: Callable = DEFAULT_NORM_LAYER
    conv_layer: Callable = DEFAULT_CONV_LAYER
    act_layer: Callable = DEFAULT_ACT_LAYER

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        out = self.norm_layer(x.shape[-1], name="norm1")(x, **f)
        out = self.act_layer(name="act1")(out, **f)
        out = self.conv_layer(
            self.bn_size * self.growth_rate, kernel_size=1, name="conv1"
        )(out, **f)
        out = self.norm_layer(out.shape[-1], name="norm2")(out, **f)
        out = self.act_layer(name="act2")(out, **f)
        out = self.conv_layer(self.growth_rate, kernel_size=3, padding=1, name="conv2")(
            out, **f
        )
        return jnp.concatenate([x, out], axis=-1)


class _Transition(nn.Module):
    out_features: int
    norm_layer: Callable = DEFAULT_NORM_LAYER
    conv_layer: Callable = DEFAULT_CONV_LAYER
    act_layer: Callable = DEFAULT_ACT_LAYER

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        x = self.norm_layer(x.shape[-1], name="norm")(x, **f)
        x = self.act_layer(name="act")(x, **f)
        x = self.conv_layer(self.out_features, kernel_size=1, name="conv")(x, **f)
        return pooling.avg_pool2d(x, 2, 2)


class BcosDenseNet(nn.Module):
    """densenet.py re-expressed functionally. ``stem_pool``: 'avg' (bcosified
    standard change features[3]->AvgPool) | 'max' (plain) | None."""

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    num_classes: int = 1000
    norm_layer: Callable = DEFAULT_NORM_LAYER
    conv_layer: Callable = DEFAULT_CONV_LAYER
    act_layer: Callable = DEFAULT_ACT_LAYER
    fc_layer: Optional[Callable] = None
    stem_pool: Optional[str] = "avg"
    small_inputs: bool = False
    gap_reorder: bool = True
    with_logit_layer: bool = False
    logit_bias: Optional[float] = None
    logit_temperature: Optional[float] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        if self.small_inputs:
            x = self.conv_layer(
                self.num_init_features, kernel_size=3, padding=1, name="conv0"
            )(x, **f)
        else:
            x = self.conv_layer(
                self.num_init_features, kernel_size=7, stride=2, padding=3, name="conv0"
            )(x, **f)
            x = self.norm_layer(self.num_init_features, name="norm0")(x, **f)
            x = self.act_layer(name="act0")(x, **f)
            if self.stem_pool == "avg":
                x = pooling.avg_pool2d(x, 3, 2, 1)
            elif self.stem_pool == "max":
                x = pooling.max_pool2d(x, 3, 2, 1)

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = _DenseLayer(
                    self.growth_rate,
                    self.bn_size,
                    self.norm_layer,
                    self.conv_layer,
                    self.act_layer,
                    name=f"denseblock{i + 1}_denselayer{j + 1}",
                )(x, **f)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                x = _Transition(
                    num_features // 2,
                    self.norm_layer,
                    self.conv_layer,
                    self.act_layer,
                    name=f"transition{i + 1}",
                )(x, **f)
                num_features //= 2

        x = self.norm_layer(num_features, name="norm5")(x, **f)
        # torchvision applies a final ReLU in forward (standard_models.py:58-59)
        x = self.act_layer(name="act5")(x, **f)

        fc_layer = self.fc_layer or self.conv_layer
        if self.gap_reorder:
            x = fc_layer(self.num_classes, kernel_size=1, name="classifier")(x, **f)
            x = pooling.global_avg_pool(x)
        else:
            x = pooling.global_avg_pool(x)
            x = fc_layer(self.num_classes, kernel_size=1, name="classifier")(
                x[:, None, None, :], **f
            )[:, 0, 0, :]

        if self.with_logit_layer:
            bias = (
                -math.log(self.num_classes - 1)
                if self.logit_bias is None
                else self.logit_bias
            )
            x = LogitLayer(self.logit_temperature, bias, name="logit_layer")(x, **f)
        return x


def _entry(block_config, growth_rate=32, num_init_features=64, **defaults):
    def factory(**kwargs):
        return BcosDenseNet(
            growth_rate=growth_rate,
            block_config=block_config,
            num_init_features=num_init_features,
            **{**defaults, **kwargs},
        )

    return factory


densenet121 = _entry((6, 12, 24, 16))
densenet161 = _entry((6, 12, 36, 24), growth_rate=48, num_init_features=96)
densenet169 = _entry((6, 12, 32, 32))
densenet201 = _entry((6, 12, 48, 32))

DENSENET_CONFIGS = {
    "densenet121": dict(growth_rate=32, block_config=(6, 12, 24, 16), num_init_features=64),
    "densenet161": dict(growth_rate=48, block_config=(6, 12, 36, 24), num_init_features=96),
    "densenet169": dict(growth_rate=32, block_config=(6, 12, 32, 32), num_init_features=64),
    "densenet201": dict(growth_rate=32, block_config=(6, 12, 48, 32), num_init_features=64),
}

"""B-cos VGG family (NHWC, flax.linen).

Parity target: `/root/reference/bcos/models/vgg.py`: conv/norm stacks from the
letter configs (ReLUs removed — the B-cos transform is itself non-linear),
'M' maxpools replaced by AvgPool2d, the three-conv classifier applied BEFORE
global average pooling, LogitLayer with -log(N-1) bias. ``no_pool`` folds each
pool into the preceding conv's stride (vgg.py:99-115).
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.modules import BcosConv2d, LogitLayer, norms
from bcosification_tpu.ops import pooling

__all__ = ["BcosVGG", "vgg11", "vgg11_bnu", "vgg13", "vgg13_bnu", "vgg16", "vgg16_bnu", "vgg19", "vgg19_bnu", "CFGS"]

DEFAULT_CONV_LAYER = BcosConv2d
DEFAULT_NORM_LAYER = norms.NoBias(norms.BatchNormUncentered2d)

CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class BcosVGG(nn.Module):
    cfg: str = "A"
    num_classes: int = 1000
    conv_layer: Callable = DEFAULT_CONV_LAYER
    norm_layer: Optional[Callable] = DEFAULT_NORM_LAYER
    no_pool: bool = False
    with_norm: bool = True
    logit_bias: Optional[float] = None
    logit_temperature: Optional[float] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        cfg = CFGS[self.cfg]
        # fold pools into the previous conv's stride for no_pool (vgg.py:106-110)
        entries: List[List] = [[v, 1] for v in cfg]
        if self.no_pool:
            for i, v in enumerate(cfg):
                if v == "M" and i > 0:
                    entries[i - 1][1] = 2

        idx = 0
        for v, stride in entries:
            if v == "M":
                if not self.no_pool:
                    x = pooling.avg_pool2d(x, 2, 2)
                continue
            x = self.conv_layer(
                int(v), kernel_size=3, padding=1, stride=stride,
                name=f"features_{idx}",
            )(x, **f)
            idx += 1
            if self.with_norm and self.norm_layer is not None:
                x = self.norm_layer(int(v), name=f"features_{idx}")(x, **f)
                idx += 1

        # classifier before GAP (vgg.py:46-71)
        x = self.conv_layer(4096, kernel_size=7, padding=3, name="classifier_0")(x, **f)
        x = self.conv_layer(4096, kernel_size=1, name="classifier_1")(x, **f)
        x = self.conv_layer(self.num_classes, kernel_size=1, name="classifier_2")(x, **f)
        x = pooling.global_avg_pool(x)
        bias = (
            -math.log(self.num_classes - 1)
            if self.logit_bias is None
            else self.logit_bias
        )
        return LogitLayer(self.logit_temperature, bias, name="logit_layer")(x, **f)


def _entry(cfg, with_norm):
    def factory(**kwargs):
        return BcosVGG(cfg=cfg, with_norm=with_norm, **kwargs)

    return factory


vgg11 = _entry("A", False)
vgg11_bnu = _entry("A", True)
vgg13 = _entry("B", False)
vgg13_bnu = _entry("B", True)
vgg16 = _entry("D", False)
vgg16_bnu = _entry("D", True)
vgg19 = _entry("E", False)
vgg19_bnu = _entry("E", True)

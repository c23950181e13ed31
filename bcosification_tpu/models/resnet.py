"""B-cos ResNet / ResNeXt family (NHWC, flax.linen).

One architecture covers both reference variants:
- the from-scratch B-cos ResNet (`/root/reference/bcos/models/resnet.py`):
  conv_layer=BcosConv2d, norm=NoBias(DetachablePositionNorm2d), act=Identity,
  classifier-as-1x1-conv applied BEFORE global average pooling (GAP-reorder,
  resnet.py:442-450), built-in LogitLayer;
- the bcosified-torchvision `ResNetBcos`
  (`/root/reference/bcos/models/standard_models.py:36-54` +
  `/root/reference/bcosify.py`): conv_layer=BcosifyConv2d (raw weights),
  norm=BatchNormUncentered2d, act=ReLU, stem maxpool replaced by AvgPool2d
  (`experiment_parameters.py:99`), fc -> 1x1 conv before avgpool; the
  6-channel Normalize + LogitLayer live in the `BcosifyNetwork` wrapper
  (models/bcosify_net.py).

Sub-module names mirror the torch state_dict keys (conv1, bn1, layer{i} block
{j}, downsample.{0,1}, fc) so checkpoint import is a mechanical key map (see
bcosify/torch_import.py).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.modules import (
    BcosConv2d,
    BcosifyConv2d,
    Identity,
    LogitLayer,
    ReLU,
    StochasticDepth,
    norms,
)
from bcosification_tpu.ops.bcos import channel_sumsq
from bcosification_tpu.ops import pooling

__all__ = [
    "BasicBlock",
    "Bottleneck",
    "BcosResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "resnext50_32x4d",
    "wide_resnet50_2",
]

DEFAULT_NORM_LAYER = norms.NoBias(norms.DetachablePositionNorm2d)
DEFAULT_CONV_LAYER = BcosConv2d
DEFAULT_ACT_LAYER = Identity


def _conv(mod, x, f, hint):
    """Call a conv module, forwarding the channel-sumsq patch-norm hint when
    the module supports it (B-cos convs; plain convs don't take it)."""
    if isinstance(mod, (BcosConv2d, BcosifyConv2d)):
        return mod(x, **f, x_sumsq=hint)
    return mod(x, **f)


def _conv_bn_act(conv_mod, norm_mod, act_mod, x, f, hint, residual=None, post_act=None):
    """conv -> norm -> act [-> +residual -> post_act], folded into one fused
    op call when possible.

    Under BCOS_FUSED=1 (eval/explain only), uncentered-BN eval is a
    per-channel affine, so the norm's (mult, add) fold into the B-cos conv's
    epilogue (ops/pallas/bcos_conv1x1.py: Pallas kernel on TPU, equivalent
    jnp otherwise) — one HBM pass instead of three. In explanation mode the
    BCOS_EXPLAIN_SEGMENT / BCOS_EXPLAIN_LAYER custom-VJP variants route
    through the same epilogue hook (ops/bcos.py has the measurements).
    Parameters/variables are declared through the same module scopes either
    way, so checkpoints and param paths are identical.

    ``act_mod=None`` means no activation. ``residual``/``post_act`` carry the
    torchvision block tail (skip-add, then activation) into the fold —
    mutually exclusive with ``act_mod``.
    """
    from bcosification_tpu.ops.bcos import (
        explain_layer_enabled,
        explain_segment_enabled,
    )
    from bcosification_tpu.ops.pallas.bcos_conv1x1 import fusion_requested

    assert act_mod is None or post_act is None
    relu = isinstance(act_mod, ReLU) or isinstance(post_act, ReLU)
    if (
        (
            fusion_requested()
            # explain mode folds the eval-BN affine into a custom VJP — same
            # values, residual-free backward (ops.bcos.b2_explain_segment /
            # b2_explain_layer)
            or (
                f.get("explain", False)
                and (explain_layer_enabled() or explain_segment_enabled())
            )
        )
        and not f["train"]
        and isinstance(conv_mod, (BcosConv2d, BcosifyConv2d))
        and isinstance(norm_mod, norms._RunningVarNorm)
        and (act_mod is None or relu or isinstance(act_mod, Identity))
        and (post_act is None or relu or isinstance(post_act, Identity))
    ):
        mult, add = norm_mod(None, return_affine=True)
        return conv_mod(x, **f, x_sumsq=hint, epilogue=(mult, add, relu, residual))
    out = _conv(conv_mod, x, f, hint)
    out = norm_mod(out, **f)
    if act_mod is not None:
        out = act_mod(out, **f)
    if residual is not None:
        out = out + residual
    if post_act is not None:
        out = post_act(out, **f)
    return out


def _ckpt(x):
    """Tag an activation as a rematerialisation boundary.

    An identity op unless the caller wraps the forward in
    ``jax.checkpoint(f, policy=save_only_these_names("bcos_act"))`` — the
    explanation path does (explain/core.py): fwd+explain on v5e is HBM-bound,
    and with only these block activations saved, the VJP recomputes each
    segment's conv/patch-norm/scale from the previous activation instead of
    storing activation-sized dynamic-scale residuals (one extra HBM write +
    read per B-cos layer otherwise)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "bcos_act")


class BasicBlock(nn.Module):
    """resnet.py:68-134."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion: int = 1
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    norm_layer: Callable = DEFAULT_NORM_LAYER
    conv_layer: Callable = DEFAULT_CONV_LAYER
    act_layer: Callable = DEFAULT_ACT_LAYER
    stochastic_depth_prob: float = 0.0

    @nn.compact
    def __call__(
        self, x, *, train: bool = False, explain: bool = False, x_sumsq=None
    ):
        f = dict(train=train, explain=explain)
        identity = x
        out = _ckpt(_conv_bn_act(
            self.conv_layer(
                self.planes, kernel_size=3, stride=self.stride, padding=self.dilation,
                dilation=self.dilation, groups=self.groups, name="conv1",
            ),
            self.norm_layer(self.planes, name="bn1"),
            self.act_layer(name="act1"),
            x, f, x_sumsq,
        ))
        if self.has_downsample:
            identity = _conv_bn_act(
                self.conv_layer(
                    self.planes * self.expansion, kernel_size=1, stride=self.stride,
                    name="downsample_conv",
                ),
                self.norm_layer(self.planes * self.expansion, name="downsample_norm"),
                None,
                x, f, x_sumsq,
            )
        conv2 = self.conv_layer(self.planes, kernel_size=3, padding=1, name="conv2")
        bn2 = self.norm_layer(self.planes, name="bn2")
        act_out = self.act_layer(name="act_out")
        if self.stochastic_depth_prob:
            out = _conv_bn_act(conv2, bn2, None, out, f, channel_sumsq(out))
            out = StochasticDepth(self.stochastic_depth_prob, "row", name="sd")(out, **f)
            out = act_out(out + identity, **f)
        else:
            out = _conv_bn_act(
                conv2, bn2, None, out, f, channel_sumsq(out),
                residual=identity, post_act=act_out,
            )
        return _ckpt(out)


class Bottleneck(nn.Module):
    """resnet.py:137-216 (ResNet V1.5: stride on the 3x3)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion: int = 4
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    norm_layer: Callable = DEFAULT_NORM_LAYER
    conv_layer: Callable = DEFAULT_CONV_LAYER
    act_layer: Callable = DEFAULT_ACT_LAYER
    stochastic_depth_prob: float = 0.0

    @nn.compact
    def __call__(
        self, x, *, train: bool = False, explain: bool = False, x_sumsq=None
    ):
        f = dict(train=train, explain=explain)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = _ckpt(_conv_bn_act(
            self.conv_layer(width, kernel_size=1, name="conv1"),
            self.norm_layer(width, name="bn1"),
            self.act_layer(name="act1"),
            x, f, x_sumsq,
        ))
        out = _ckpt(_conv_bn_act(
            self.conv_layer(
                width, kernel_size=3, stride=self.stride, padding=self.dilation,
                dilation=self.dilation, groups=self.groups, name="conv2",
            ),
            self.norm_layer(width, name="bn2"),
            self.act_layer(name="act2"),
            out, f, channel_sumsq(out),
        ))
        if self.has_downsample:
            identity = _conv_bn_act(
                self.conv_layer(
                    self.planes * self.expansion, kernel_size=1, stride=self.stride,
                    name="downsample_conv",
                ),
                self.norm_layer(self.planes * self.expansion, name="downsample_norm"),
                None,
                x, f, x_sumsq,
            )
        conv3 = self.conv_layer(
            self.planes * self.expansion, kernel_size=1, name="conv3"
        )
        bn3 = self.norm_layer(self.planes * self.expansion, name="bn3")
        act_out = self.act_layer(name="act_out")
        if self.stochastic_depth_prob:
            out = _conv_bn_act(conv3, bn3, None, out, f, channel_sumsq(out))
            out = StochasticDepth(self.stochastic_depth_prob, "row", name="sd")(out, **f)
            out = act_out(out + identity, **f)
        else:
            out = _conv_bn_act(
                conv3, bn3, None, out, f, channel_sumsq(out),
                residual=identity, post_act=act_out,
            )
        return _ckpt(out)


_BLOCKS = {"basic": (BasicBlock, 1), "bottleneck": (Bottleneck, 4)}


class BcosResNet(nn.Module):
    """resnet.py:219-472 re-expressed functionally.

    ``stem_pool``: None (small inputs) | 'avg' (B-cos default / bcosified
    standard change) | 'max' (plain torchvision).
    ``gap_reorder``: classifier (1x1 conv) before GAP (True for all B-cos
    variants; False gives the plain torchvision eval forward).
    ``logit_bias`` None uses -log(num_classes - 1); set ``with_logit_layer``
    False for the bcosified variant (LogitLayer lives in BcosifyNetwork).
    """

    block: str = "basic"
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    norm_layer: Callable = DEFAULT_NORM_LAYER
    conv_layer: Callable = DEFAULT_CONV_LAYER
    act_layer: Callable = DEFAULT_ACT_LAYER
    inplanes: int = 64
    small_inputs: bool = False
    stem_pool: Optional[str] = "avg"
    stochastic_depth_prob: float = 0.0
    gap_reorder: bool = True
    fc_layer: Optional[Callable] = None  # defaults to conv_layer
    with_logit_layer: bool = True
    logit_bias: Optional[float] = None
    logit_temperature: Optional[float] = None

    def _block_cfgs(self):
        """Per-block (stage, planes, stride, has_downsample, sd_prob)."""
        block_cls, expansion = _BLOCKS[self.block]
        total = sum(self.layers)
        cfgs = []
        inplanes = self.inplanes
        idx = 0
        for stage, num_blocks in enumerate(self.layers):
            planes = self.inplanes * (2**stage)
            for j in range(num_blocks):
                stride = 2 if (stage > 0 and j == 0) else 1
                has_ds = stride != 1 or inplanes != planes * expansion
                sd = (
                    self.stochastic_depth_prob * idx / max(total - 1, 1)
                    if self.stochastic_depth_prob
                    else 0.0
                )
                cfgs.append((stage, j, planes, stride, has_ds, sd))
                inplanes = planes * expansion
                idx += 1
        return block_cls, expansion, cfgs, inplanes

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        block_cls, expansion, cfgs, num_features = self._block_cfgs()

        if self.small_inputs:
            x = self.conv_layer(self.inplanes, kernel_size=3, padding=1, name="conv1")(
                x, **f
            )
        else:
            x = self.conv_layer(
                self.inplanes, kernel_size=7, stride=2, padding=3, name="conv1"
            )(x, **f)
        x = self.norm_layer(self.inplanes, name="bn1")(x, **f)
        x = _ckpt(self.act_layer(name="act")(x, **f))
        if not self.small_inputs and self.stem_pool is not None:
            if self.stem_pool == "avg":
                x = pooling.avg_pool2d(x, 3, 2, 1)
            elif self.stem_pool == "max":
                x = pooling.max_pool2d(x, 3, 2, 1)
            else:
                raise ValueError(self.stem_pool)

        hint = channel_sumsq(x)
        for stage, j, planes, stride, has_ds, sd in cfgs:
            x = block_cls(
                planes=planes,
                stride=stride,
                has_downsample=has_ds,
                groups=self.groups,
                base_width=self.width_per_group,
                norm_layer=self.norm_layer,
                conv_layer=self.conv_layer,
                act_layer=self.act_layer,
                stochastic_depth_prob=sd,
                name=f"layer{stage + 1}_{j}",
            )(x, **f, x_sumsq=hint)
            hint = channel_sumsq(x)

        fc_layer = self.fc_layer or self.conv_layer
        if self.gap_reorder:
            x = _conv(fc_layer(self.num_classes, kernel_size=1, name="fc"), x, f, hint)
            x = pooling.global_avg_pool(x)
        else:
            x = pooling.global_avg_pool(x)
            x = fc_layer(self.num_classes, kernel_size=1, name="fc")(
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


def _entry(block, layers, **defaults):
    def factory(**kwargs):
        return BcosResNet(block=block, layers=layers, **{**defaults, **kwargs})

    return factory


resnet18 = _entry("basic", (2, 2, 2, 2))
resnet34 = _entry("basic", (3, 4, 6, 3))
resnet50 = _entry("bottleneck", (3, 4, 6, 3))
resnet101 = _entry("bottleneck", (3, 4, 23, 3))
resnet152 = _entry("bottleneck", (3, 8, 36, 3))
resnext50_32x4d = _entry("bottleneck", (3, 4, 6, 3), groups=32, width_per_group=4)
wide_resnet50_2 = _entry("bottleneck", (3, 4, 6, 3), width_per_group=128)

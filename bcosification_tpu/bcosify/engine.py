"""B-cosification engine — build a bcosified model + parameters from a
pretrained checkpoint and a model_config.

Parity target: `BcosifyNetwork` + the per-experiment `get_model` factories
(`/root/reference/bcosify.py`,
`/root/reference/bcos/experiments/ImageNet/bcosification/model.py`).

The reference mutates a live torch module tree; the TPU-native design is:
  (1) pick a bcosified *architecture* (layer factories: BcosifyConv2d for
      convs, BatchNormUncentered2d for BN, ReLU kept or Identity ablation,
      stem maxpool -> AvgPool2d, fc -> 1x1 conv with GAP reorder);
  (2) apply pure *parameter transforms* to the pretrained weights
      (add_channels, BnUncV2 bias fold, fc reshape) — bcosify/params.py;
  (3) wrap in BcosifyNetwork (6-channel Normalize + LogitLayer).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.bcosify import torch_import
from bcosification_tpu.models import resnet as resnet_lib
from bcosification_tpu.models.bcosify_net import BcosifyNetwork, normalization_for
from bcosification_tpu.modules import BcosifyConv2d, Identity, ReLU, norms

__all__ = ["build_bcosified_resnet", "build_bcosified_densenet", "RESNET_LAYERS"]

RESNET_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _bcosify_factories(model_config: Dict[str, Any]):
    """Map the reference's bcosify_args onto layer factories
    (bcosify.py:74-114 dispatch + experiment_parameters.py:91-98 defaults)."""
    bargs = model_config.get("bcosify_args", {}) or {}
    bcos_args = model_config.get("bcos_args", {}) or {}
    b = bcos_args.get("b", 2)
    use_bias = bargs.get("use_bias", False)
    clamping = bargs.get("clamping", False)
    b_loss = bargs.get("learn_b", False)
    norm_name = bargs.get("norm_layer", "BnUncV2")
    act = bargs.get("act_layer", True)

    conv_layer = partial(
        BcosifyConv2d, b=float(b), clamping=clamping, b_loss=b_loss
    )
    if norm_name in ("BnUnc2d", "BnUncV2"):
        norm_layer = (
            norms.BatchNormUncentered2d
            if use_bias
            else norms.NoBias(norms.BatchNormUncentered2d)
        )
    else:
        raise ValueError(f"unsupported norm_layer {norm_name!r}")
    act_layer = ReLU if act else Identity
    return conv_layer, norm_layer, act_layer, use_bias, norm_name


def build_bcosified_resnet(
    model_config: Dict[str, Any],
    state_dict: Optional[Mapping[str, Any]] = None,
    *,
    input_size: int = 224,
    num_classes: int = 1000,
    inplanes: int = 64,
) -> Tuple[BcosifyNetwork, Any]:
    """Build BcosifyNetwork(ResNetBcos) + variables.

    model_config follows the reference CONFIGS shape
    (`ImageNet/bcosification/experiment_parameters.py:82-106`):
    {"name": "resnet18", "bcosify_args": {...}, "bcos_args": {"b": 2}, ...}.

    With ``state_dict`` (torchvision checkpoint) the conversion transforms are
    applied; otherwise random init (the `weights=None` random baseline).
    When bcosify_args.use_bias is true, folded BN biases + fc bias are kept —
    this makes the b=1 conversion EXACTLY equivalent to the pretrained model
    (eval mode), the conversion correctness oracle. The reference's production
    recipe uses use_bias=False (all biases nulled, model.py:51-55).
    """
    arch = model_config["name"]
    block, layers = RESNET_LAYERS[arch]
    conv_layer, norm_layer, act_layer, use_bias, norm_name = _bcosify_factories(
        model_config
    )
    # use_bias keeps biases that exist in the source model (BN + fc), it does
    # not add biases to the (bias-free) torchvision convs
    fc_layer = partial(conv_layer, use_bias=use_bias)

    bargs = model_config.get("bcosify_args", {}) or {}
    mean, std = normalization_for(
        clip_kd=bool(bargs.get("clip_kd", False)),
        linearprobe_clip=bool(bargs.get("linearprobe_clip", False)),
        bfy_mean_zero=bool(model_config.get("bfy_mean_zero", False)),
    )

    backbone = resnet_lib.BcosResNet(
        block=block,
        layers=layers,
        num_classes=num_classes,
        inplanes=inplanes,
        conv_layer=conv_layer,
        norm_layer=norm_layer,
        act_layer=act_layer,
        stem_pool="avg",  # standard_changes: maxpool -> AvgPool2d(3,2,1)
        gap_reorder=bool(bargs.get("gap", True)),
        fc_layer=fc_layer,
        with_logit_layer=False,  # LogitLayer lives in BcosifyNetwork
        name="model",
    )
    net = BcosifyNetwork(
        model=backbone,
        num_classes=num_classes,
        with_logit_layer=True,
        mean=mean,
        std=std,
    )

    x0 = jnp.zeros((1, input_size, input_size, 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))

    if state_dict is None:
        # jit: one compiled program instead of hundreds of eager dispatches
        variables = jax.jit(net.init)(
            jax.random.PRNGKey(model_config.get("seed", 0) or 0), x0
        )
    else:
        # fc.weight in torchvision is a Linear even though ours is a 1x1 conv
        variables = torch_import.resnet_torch_to_variables(
            abstract,
            state_dict,
            layers,
            add_channels=True,
            fold_bn_bias=(norm_name == "BnUncV2"),
            use_bias=use_bias,
        )
    return net, variables


def build_bcosified_densenet(
    model_config: Dict[str, Any],
    state_dict: Optional[Mapping[str, Any]] = None,
    *,
    input_size: int = 224,
    num_classes: int = 1000,
) -> Tuple[BcosifyNetwork, Any]:
    """DenseNet analogue of build_bcosified_resnet
    (`ImageNet/bcosification/model.py:30-36` + `standard_models.py:56-63`)."""
    from bcosification_tpu.bcosify.torch_import import densenet_torch_to_variables
    from bcosification_tpu.models.densenet import DENSENET_CONFIGS, BcosDenseNet

    arch = model_config["name"]
    arch_cfg = DENSENET_CONFIGS[arch]
    conv_layer, norm_layer, act_layer, use_bias, norm_name = _bcosify_factories(
        model_config
    )
    fc_layer = partial(conv_layer, use_bias=use_bias)

    bargs = model_config.get("bcosify_args", {}) or {}
    mean, std = normalization_for(
        clip_kd=bool(bargs.get("clip_kd", False)),
        linearprobe_clip=bool(bargs.get("linearprobe_clip", False)),
        bfy_mean_zero=bool(model_config.get("bfy_mean_zero", False)),
    )
    backbone = BcosDenseNet(
        num_classes=num_classes,
        conv_layer=conv_layer,
        norm_layer=norm_layer,
        act_layer=act_layer,
        fc_layer=fc_layer,
        stem_pool="avg",  # standard_changes: features[3] -> AvgPool2d(3,2,1)
        gap_reorder=bool(bargs.get("gap", True)),
        name="model",
        **arch_cfg,
    )
    net = BcosifyNetwork(
        model=backbone, num_classes=num_classes, with_logit_layer=True,
        mean=mean, std=std,
    )
    x0 = jnp.zeros((1, input_size, input_size, 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    if state_dict is None:
        variables = jax.jit(net.init)(
            jax.random.PRNGKey(model_config.get("seed", 0) or 0), x0
        )
    else:
        variables = densenet_torch_to_variables(
            abstract,
            state_dict,
            arch_cfg["block_config"],
            add_channels=True,
            fold_bn_bias=(norm_name == "BnUncV2"),
            use_bias=use_bias,
        )
    return net, variables

"""Model factory for ImageNet/vit_bcosification.

Parity target: `/root/reference/bcos/experiments/ImageNet/vit_bcosification/
model.py:7-31`: load the pretrained *standard* SimpleViT (torch.hub
B-cos/B-cos-v2 "standard_<arch>"), B-cosify it (bcosify_vit.py: patch-embed
channel doubling, Linear->BcosifyLinear except to_qkv, GELU->MyGELU,
LN->DetachableLayerNorm), null biases unless use_bias, wrap with the 6-channel
Normalize + LogitLayer.

Hub checkpoints resolve offline from $BCOS_HUB_PATH/standard_<arch>.{pth,npz}.
"""
from __future__ import annotations

import os
import warnings
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.bcosify.torch_import import simple_vit_torch_to_variables
from bcosification_tpu.models import vit as vit_lib
from bcosification_tpu.models.bcosify_net import BcosifyNetwork
from bcosification_tpu.modules import BcosifyLinear, DetachableGELU, Identity, norms

__all__ = ["get_model", "load_hub_state_dict"]


def load_hub_state_dict(arch_name: str):
    root = os.getenv("BCOS_HUB_PATH")
    if not root:
        warnings.warn(
            f"BCOS_HUB_PATH not set; standard_{arch_name} will be randomly "
            "initialised instead of hub-pretrained."
        )
        return None
    for ext in (".pth", ".pt", ".npz"):
        path = Path(root) / f"standard_{arch_name}{ext}"
        if path.exists():
            if ext == ".npz":
                return dict(np.load(path))
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            return sd.get("model", sd) if isinstance(sd, dict) else sd
    warnings.warn(f"No hub checkpoint for standard_{arch_name} under {root}.")
    return None


def get_model(model_config):
    arch_name = model_config["name"]
    args = dict(model_config.get("args", {}))
    bargs = model_config.get("bcosify_args", {}) or {}
    use_bias = bool(bargs.get("use_bias", False))
    act = bool(model_config.get("act_layer", True))
    gap_reorder = bool(args.get("gap_reorder", False))
    num_classes = args.get("num_classes", 1000)

    cfg = vit_lib.VIT_CONFIGS[arch_name]
    backbone = vit_lib.SimpleViT(
        num_classes=num_classes,
        linear_layer=partial(BcosifyLinear, b=model_config.get("bcos_args", {}).get("b", 2), use_bias=use_bias),
        norm_layer=(
            norms.DetachableLayerNorm
            if use_bias
            else norms.NoBias(norms.DetachableLayerNorm)
        ),
        act_layer=DetachableGELU if act else Identity,
        qkv_layer=vit_lib.PlainLinear,  # to_qkv stays plain (bcosify_vit.py:138)
        gap_reorder=gap_reorder,
        name="model",
        **cfg,
    )
    net = BcosifyNetwork(
        model=backbone,
        num_classes=num_classes,
        with_logit_layer=bool(model_config.get("logit_layer", False)),
        logit_bias=model_config.get("logit_bias"),
    )

    input_size = cfg["image_size"]
    x0 = jnp.zeros((1, input_size, input_size, 6), jnp.float32)
    state_dict = (
        load_hub_state_dict(arch_name) if model_config.get("weights") else None
    )
    if state_dict is None:
        variables = jax.jit(net.init)(
            jax.random.PRNGKey(model_config.get("seed", 0) or 0), x0
        )
    else:
        abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
        variables = simple_vit_torch_to_variables(
            abstract,
            state_dict,
            cfg["depth"],
            add_channels=True,
            use_bias=use_bias,
        )
    return net, variables

"""Model factory for ImageNet/vit_final (from-scratch SimpleViT).

Parity target: `/root/reference/bcos/experiments/ImageNet/vit_final/
model.py:21-48`: inject BcosLinear/BcosConv2d (partial-applied with bcos_args)
or plain layers, wrap B-cos models with a LogitLayer.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bcosification_tpu.models import vit as vit_lib
from bcosification_tpu.modules import (
    BcosConv2d,
    BcosLinear,
    DetachableGELU,
    Identity,
    NormedConv2d,
    PlainGELU,
)

__all__ = ["get_model"]

# "gelu_plain" is the reference's nn.GELU in the standard (is_bcos=False)
# configs — same forward, no explanation-mode gate detach.
_ACTS = {"gelu": DetachableGELU, "gelu_plain": PlainGELU, "identity": Identity}


def _plain_conv(features, **kw):
    kw.pop("b", None)
    return NormedConv2d(features, use_weight_norm=False, use_bias=True, **kw)


def get_model(model_config):
    arch_name = model_config["name"]
    args = dict(model_config["args"])
    is_bcos = model_config["is_bcos"]

    act = args.pop("act_layer", "identity")
    args["act_layer"] = _ACTS[act] if isinstance(act, str) else act
    channels = args.pop("channels", 6)

    if "linear_layer" not in args:
        if is_bcos:
            bcos_args = model_config.get("bcos_args", {})
            args["linear_layer"] = partial(BcosLinear, **bcos_args)
            args["conv2d_layer"] = partial(BcosConv2d, **bcos_args)
        else:
            args["linear_layer"] = vit_lib.PlainLinear
            args["conv2d_layer"] = _plain_conv

    factory = getattr(vit_lib, arch_name)
    model = factory(
        with_logit_layer=is_bcos,
        logit_bias=model_config.get("logit_bias"),
        **args,
    )

    from bcosification_tpu.utils.init_mode import initialize

    input_size = 224 if "patch16_224" in arch_name else 14
    x0 = jnp.zeros((1, input_size, input_size, channels), jnp.float32)
    variables = initialize(
        model, jax.random.PRNGKey(model_config.get("seed", 0) or 0), x0
    )
    return model, variables

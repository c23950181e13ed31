"""OpenAI CLIP checkpoint import + the B-cosified CLIP builder.

Parity targets:
- teacher/text import: the vendored fork's `build_model(state_dict,
  pretrained)` (`/root/reference/CLIP/clip/model.py:400-438`, fp16 -> fp32 via
  `.float()` in `clip_bcosification/model.py:12`);
- student conversion: `BcosifyNetwork(model.visual, ...)` for CLIP
  (`/root/reference/bcosify.py:74-114` — Conv2d->BcosifyConv2d, BN->uncentered
  +fold, attnpool->BcosAttentionPool2d with q/k/v kept plain and only c_proj
  bcosified, biases AND positional_embedding nulled,
  `clip_bcosification/model.py:8-25`).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.bcosify import params as P
from bcosification_tpu.bcosify.engine import _bcosify_factories
from bcosification_tpu.bcosify.torch_import import FlatParams, _bn_entries, _np, fill_variables
from bcosification_tpu.clip import model as clip_model
from bcosification_tpu.models.bcosify_net import BcosifyNetwork, normalization_for
from bcosification_tpu.models.vit import PlainLinear
from bcosification_tpu.modules import BcosifyLinear

__all__ = [
    "clip_text_to_variables",
    "clip_visual_teacher_to_variables",
    "clip_visual_student_to_variables",
    "build_clip_text",
    "build_clip_teacher_visual",
    "build_bcosified_clip_visual",
]


def _lin(flat, sd, tp, jp, use_bias=True):
    flat[("params",) + jp + ("weight",)] = P.torch_linear_weight(sd[f"{tp}.weight"])
    if use_bias and f"{tp}.bias" in sd:
        flat[("params",) + jp + ("bias",)] = _np(sd[f"{tp}.bias"])


def _ln(flat, sd, tp, jp):
    flat[("params",) + jp + ("weight",)] = _np(sd[f"{tp}.weight"])
    flat[("params",) + jp + ("bias",)] = _np(sd[f"{tp}.bias"])


def _teacher_bn(flat, sd, tp, jp):
    flat[("params",) + jp + ("weight",)] = _np(sd[f"{tp}.weight"])
    flat[("params",) + jp + ("bias",)] = _np(sd[f"{tp}.bias"])
    flat[("batch_stats",) + jp + ("running_mean",)] = _np(sd[f"{tp}.running_mean"])
    flat[("batch_stats",) + jp + ("running_var",)] = _np(sd[f"{tp}.running_var"])


def clip_text_to_variables(abstract, sd: Mapping[str, Any], layers: int):
    """Import the text tower (token/pos embeddings, resblocks, ln_final,
    text_projection)."""
    flat: FlatParams = {}
    flat[("params", "token_embedding")] = _np(sd["token_embedding.weight"])
    flat[("params", "positional_embedding")] = _np(sd["positional_embedding"])
    flat[("params", "text_projection")] = _np(sd["text_projection"])
    for i in range(layers):
        tp = f"transformer.resblocks.{i}"
        jp = (f"resblocks_{i}",)
        flat[("params",) + jp + ("attn_in_proj", "weight")] = P.torch_linear_weight(
            sd[f"{tp}.attn.in_proj_weight"]
        )
        flat[("params",) + jp + ("attn_in_proj", "bias")] = _np(sd[f"{tp}.attn.in_proj_bias"])
        _lin(flat, sd, f"{tp}.attn.out_proj", jp + ("attn_out_proj",))
        _ln(flat, sd, f"{tp}.ln_1", jp + ("ln_1",))
        _ln(flat, sd, f"{tp}.ln_2", jp + ("ln_2",))
        _lin(flat, sd, f"{tp}.mlp.c_fc", jp + ("mlp_c_fc",))
        _lin(flat, sd, f"{tp}.mlp.c_proj", jp + ("mlp_c_proj",))
    _ln(flat, sd, "ln_final", ("ln_final",))
    return fill_variables(abstract, flat)


def _visual_resnet_entries(
    flat: FlatParams,
    sd: Mapping[str, Any],
    layers,
    *,
    bcosified: bool,
    use_bias: bool = False,
    scope: Tuple[str, ...] = (),
):
    """Shared ModifiedResNet trunk mapping; bcosified selects the uncentered-
    BN fold vs teacher centered BN + whether conv1 is channel-doubled."""

    def bn(tp, jp):
        if bcosified:
            _bn_entries(flat, sd, tp, jp, fold_bias=True, use_bias=use_bias)
        else:
            _teacher_bn(flat, sd, tp, jp)

    for k in (1, 2, 3):
        w = P.torch_conv_weight(sd[f"visual.conv{k}.weight"])
        if bcosified and k == 1:
            w = P.add_channels_conv_weight(w)
        flat[("params",) + scope + (f"conv{k}", "weight")] = w
        bn(f"visual.bn{k}", scope + (f"bn{k}",))

    for stage, n_blocks in enumerate(layers):
        for j in range(n_blocks):
            tp = f"visual.layer{stage + 1}.{j}"
            jp = scope + (f"layer{stage + 1}_{j}",)
            for k in (1, 2, 3):
                flat[("params",) + jp + (f"conv{k}", "weight")] = P.torch_conv_weight(
                    sd[f"{tp}.conv{k}.weight"]
                )
                bn(f"{tp}.bn{k}", jp + (f"bn{k}",))
            if f"{tp}.downsample.0.weight" in sd:
                flat[("params",) + jp + ("downsample_conv", "weight")] = (
                    P.torch_conv_weight(sd[f"{tp}.downsample.0.weight"])
                )
                bn(f"{tp}.downsample.1", jp + ("downsample_norm",))


def clip_visual_teacher_to_variables(abstract, sd: Mapping[str, Any], layers):
    flat: FlatParams = {}
    _visual_resnet_entries(flat, sd, layers, bcosified=False)
    flat[("params", "attnpool", "positional_embedding")] = _np(
        sd["visual.attnpool.positional_embedding"]
    )
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        _lin(flat, sd, f"visual.attnpool.{p}", ("attnpool", p))
    return fill_variables(abstract, flat)


def clip_visual_student_to_variables(
    abstract,
    sd: Mapping[str, Any],
    layers,
    *,
    attn_unpool: bool = False,
    use_bias: bool = False,
    scope: Tuple[str, ...] = ("model",),
):
    flat: FlatParams = {}
    _visual_resnet_entries(flat, sd, layers, bcosified=True, use_bias=use_bias, scope=scope)
    # attnpool: positional embedding dropped; q/k/v plain, c_proj bcosified;
    # biases nulled (clip_bcosification/model.py:19-24)
    projs = ("v_proj", "c_proj") if attn_unpool else ("q_proj", "k_proj", "v_proj", "c_proj")
    for p in projs:
        _lin(flat, sd, f"visual.attnpool.{p}", scope + ("attnpool", p), use_bias=use_bias)
    return fill_variables(abstract, flat)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def build_clip_text(sd: Optional[Mapping[str, Any]] = None, cfg: Optional[dict] = None):
    cfg = cfg or (clip_model.config_from_state_dict(sd) if sd else clip_model.clip_rn50_config())
    text = clip_model.TextTransformer(
        vocab_size=cfg["vocab_size"],
        context_length=cfg["context_length"],
        width=cfg["transformer_width"],
        heads=cfg["transformer_heads"],
        layers=cfg["transformer_layers"],
        embed_dim=cfg["embed_dim"],
    )
    tokens0 = jnp.zeros((1, cfg["context_length"]), jnp.int32)
    abstract = jax.eval_shape(lambda: text.init(jax.random.PRNGKey(0), tokens0))
    if sd is None:
        variables = jax.jit(text.init)(jax.random.PRNGKey(0), tokens0)
    else:
        variables = clip_text_to_variables(abstract, sd, cfg["transformer_layers"])
    return text, variables


def build_clip_teacher_visual(sd: Optional[Mapping[str, Any]] = None, cfg: Optional[dict] = None):
    cfg = cfg or (clip_model.config_from_state_dict(sd) if sd else clip_model.clip_rn50_config())
    assert isinstance(cfg["vision_layers"], (tuple, list)), "RN teacher only"
    visual = clip_model.ModifiedResNet(
        layers=tuple(cfg["vision_layers"]),
        output_dim=cfg["embed_dim"],
        heads=cfg["vision_width"] * 32 // 64,
        input_resolution=cfg["image_resolution"],
        width=cfg["vision_width"],
        attnpool="standard",
    )
    x0 = jnp.zeros((1, cfg["image_resolution"], cfg["image_resolution"], 3), jnp.float32)
    abstract = jax.eval_shape(lambda: visual.init(jax.random.PRNGKey(0), x0))
    if sd is None:
        variables = jax.jit(visual.init)(jax.random.PRNGKey(0), x0)
    else:
        variables = clip_visual_teacher_to_variables(abstract, sd, cfg["vision_layers"])
    return visual, variables


def build_bcosified_clip_visual(
    model_config: Dict[str, Any],
    sd: Optional[Mapping[str, Any]] = None,
    cfg: Optional[dict] = None,
):
    """The student: BcosifyNetwork(bcosified ModifiedResNet visual)."""
    from bcosification_tpu.modules import norms

    cfg = cfg or (clip_model.config_from_state_dict(sd) if sd else clip_model.clip_rn50_config())
    bargs = model_config.get("bcosify_args", {}) or {}
    b = model_config.get("bcos_args", {}).get("b", 2)
    use_bias = bool(bargs.get("use_bias", False))
    attn_unpool = bool(model_config.get("attn_unpool", False))

    from bcosification_tpu.modules import BcosifyConv2d

    conv_layer = partial(BcosifyConv2d, b=float(b))
    norm_layer = (
        norms.BatchNormUncentered2d if use_bias else norms.NoBias(norms.BatchNormUncentered2d)
    )
    visual = clip_model.ModifiedResNet(
        layers=tuple(cfg["vision_layers"]),
        output_dim=cfg["embed_dim"],
        heads=cfg["vision_width"] * 32 // 64,
        input_resolution=cfg["image_resolution"],
        width=cfg["vision_width"],
        conv_layer=conv_layer,
        norm_layer=norm_layer,
        attnpool="bcos_unpool" if attn_unpool else "bcos",
        attnpool_linear_layer=partial(PlainLinear, use_bias=use_bias),
        attnpool_c_proj_layer=partial(BcosifyLinear, b=float(b), use_bias=use_bias),
        name="model",
    )
    mean, std = normalization_for(
        clip_kd=True, bfy_mean_zero=bool(model_config.get("bfy_mean_zero", False))
    )
    net = BcosifyNetwork(
        model=visual, with_logit_layer=False, mean=mean, std=std
    )
    x0 = jnp.zeros((1, cfg["image_resolution"], cfg["image_resolution"], 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    if sd is None:
        variables = jax.jit(net.init)(
            jax.random.PRNGKey(model_config.get("seed", 0) or 0), x0
        )
    else:
        variables = clip_visual_student_to_variables(
            abstract,
            sd,
            cfg["vision_layers"],
            attn_unpool=attn_unpool,
            use_bias=use_bias,
        )
    return net, variables

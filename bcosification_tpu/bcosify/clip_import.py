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
from bcosification_tpu.modules import BcosifyConv2d, BcosifyLinear

__all__ = [
    "clip_text_to_variables",
    "clip_visual_teacher_to_variables",
    "clip_visual_student_to_variables",
    "clip_trained_student_to_variables",
    "infer_clip_student_config",
    "build_clip_text",
    "build_clip_teacher_visual",
    "build_bcosified_clip_visual",
    "build_bcosified_clip_vit_visual",
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


def infer_clip_student_config(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Infer (vision cfg, model_config) from a TRAINED B-cos CLIP visual
    checkpoint (post-conversion `BcosifyNetwork(ModifiedResNet)` state,
    torch keys ``model.conv1.weight`` / ``model.layer{s}.{j}...`` /
    ``model.attnpool.{q,k,v,c}_proj...`` — the layout the reference's
    clip_bcosification experiments save). Returns a dict with the vision
    config keys build_bcosified_clip_visual consumes plus the detected
    ``attn_unpool`` / ``use_bias`` flags."""
    import re as _re

    width2 = _np(sd["model.conv1.linear.weight"]).shape[0]  # stem conv1 -> width//2
    width = width2 * 2
    layers = [0, 0, 0, 0]
    for k in sd:
        m = _re.match(r"model\.layer(\d)\.(\d+)\.conv1\.linear\.weight$", k) or _re.match(
            r"model\.layer(\d)\.(\d+)\.conv1\.weight$", k
        )
        if m:
            s, j = int(m.group(1)), int(m.group(2))
            layers[s - 1] = max(layers[s - 1], j + 1)
    c_proj_key = next(
        k for k in ("model.attnpool.c_proj.linear.weight", "model.attnpool.c_proj.weight")
        if k in sd
    )
    embed_dim = _np(sd[c_proj_key]).shape[0]
    attn_unpool = not any(
        k.startswith("model.attnpool.q_proj.") for k in sd
    )
    use_bias = any(
        k.endswith(".bias") and ("proj" in k or ".conv" in k) for k in sd
    )
    return {
        "vision_layers": tuple(layers),
        "vision_width": width,
        "embed_dim": embed_dim,
        "image_resolution": 224,
        "attn_unpool": attn_unpool,
        "use_bias": use_bias,
    }


def clip_trained_student_to_variables(variables, sd: Mapping[str, Any]):
    """Fill a bcosified-CLIP-visual flax tree from a TRAINED checkpoint of
    the reference's `BcosifyNetwork(ModifiedResNet)` (post-conversion state:
    convs are channel-doubled B-cos layers carrying ``.linear.weight``,
    norms are uncentered BN with running stats, attnpool has q/k/v plain and
    c_proj bcosified, biases + positional embedding nulled —
    `/root/reference/bcos/experiments/ImageNet/clip_bcosification/model.py:
    8-25`). The scope translation mirrors the independently-written oracle
    mapping in tests/test_e2e_clip_b2_oracle.py (`_fill_from_ref`), which
    locks this layout value-for-value against the reference's own
    conversion pipeline."""

    def _tscope(scope):
        out = []
        for s in scope:
            if s.startswith("layer") and "_" in s:
                stage, j = s.split("_")
                out += [stage, j]
            elif s == "downsample_conv":
                out += ["downsample", "1"]  # CLIP ds: 0=avgpool, 1=conv, 2=bn
            elif s == "downsample_norm":
                out += ["downsample", "2"]
            else:
                out.append(s)
        return out

    def fill(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        coll, scope, name = keys[0], keys[2:-1], keys[-1]
        tp = "model." + ".".join(_tscope(scope))
        if coll == "batch_stats":
            if name == "num_batches_tracked":
                return jnp.zeros(leaf.shape, leaf.dtype)
            return jnp.asarray(_np(sd[f"{tp}.{name}"]))
        if name == "weight" and scope and "proj" in scope[-1]:
            # attnpool linears: torch [out,in] -> (in,out); c_proj is the
            # bcosified one (inner .linear), q/k/v stay plain
            suffix = ".linear.weight" if scope[-1] == "c_proj" else ".weight"
            return jnp.asarray(P.torch_linear_weight(sd[tp + suffix]))
        if name == "weight" and leaf.ndim == 4:
            return jnp.asarray(P.torch_conv_weight(sd[f"{tp}.linear.weight"]))
        # norm affines live at <tp>.<name>; a bcosified layer's bias (when
        # use_bias configs keep them) lives inside its inner .linear
        for cand in (f"{tp}.{name}", f"{tp}.linear.{name}"):
            if cand in sd:
                return jnp.asarray(_np(sd[cand]))
        raise KeyError(f"{tp}.{name} not in checkpoint")

    return jax.tree_util.tree_map_with_path(fill, variables)


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
    if isinstance(cfg["vision_layers"], (tuple, list)):
        visual = clip_model.ModifiedResNet(
            layers=tuple(cfg["vision_layers"]),
            output_dim=cfg["embed_dim"],
            heads=cfg["vision_width"] * 32 // 64,
            input_resolution=cfg["image_resolution"],
            width=cfg["vision_width"],
            attnpool="standard",
        )
    else:
        visual = clip_model.CLIPVisionTransformer(
            input_resolution=cfg["image_resolution"],
            patch_size=cfg["vision_patch_size"],
            width=cfg["vision_width"],
            layers=cfg["vision_layers"],
            heads=cfg["vision_width"] // 64,
            output_dim=cfg["embed_dim"],
        )
    x0 = jnp.zeros((1, cfg["image_resolution"], cfg["image_resolution"], 3), jnp.float32)
    abstract = jax.eval_shape(lambda: visual.init(jax.random.PRNGKey(0), x0))
    if sd is None:
        variables = jax.jit(visual.init)(jax.random.PRNGKey(0), x0)
    elif isinstance(cfg["vision_layers"], (tuple, list)):
        variables = clip_visual_teacher_to_variables(abstract, sd, cfg["vision_layers"])
    else:
        variables = clip_visual_vit_teacher_to_variables(abstract, sd, cfg["vision_layers"])
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


def _visual_vit_entries(
    flat: FlatParams,
    sd: Mapping[str, Any],
    layers: int,
    *,
    bcosified: bool,
    use_bias: bool = True,
    scope: Tuple[str, ...] = (),
):
    """CLIP ViT tower mapping (visual.conv1 + resblocks + ln_pre/post + proj).

    bcosified: channel-double the patchify conv ([w,-w]/2, exact on the
    BcosifyNetwork's [z,-z] 6-channel encoding) and, when use_bias is False,
    null the linear biases (clip_bcosification/model.py:19-24 nulls all
    biases; the non-bcosified qkv in_proj bias is zeroed rather than removed
    so the module structure stays shared with the teacher).
    """
    w = P.torch_conv_weight(sd["visual.conv1.weight"])
    if bcosified:
        w = P.add_channels_conv_weight(w)
    flat[("params",) + scope + ("conv1", "weight")] = w
    flat[("params",) + scope + ("class_embedding",)] = _np(sd["visual.class_embedding"])
    flat[("params",) + scope + ("positional_embedding",)] = _np(
        sd["visual.positional_embedding"]
    )
    flat[("params",) + scope + ("proj",)] = _np(sd["visual.proj"])
    _ln(flat, sd, "visual.ln_pre", scope + ("ln_pre",))
    _ln(flat, sd, "visual.ln_post", scope + ("ln_post",))
    null_bias = bcosified and not use_bias
    for i in range(layers):
        tp = f"visual.transformer.resblocks.{i}"
        jp = scope + (f"resblocks_{i}",)
        flat[("params",) + jp + ("attn_in_proj", "weight")] = P.torch_linear_weight(
            sd[f"{tp}.attn.in_proj_weight"]
        )
        in_b = _np(sd[f"{tp}.attn.in_proj_bias"])
        flat[("params",) + jp + ("attn_in_proj", "bias")] = (
            np.zeros_like(in_b) if null_bias else in_b
        )
        _ln(flat, sd, f"{tp}.ln_1", jp + ("ln_1",))
        _ln(flat, sd, f"{tp}.ln_2", jp + ("ln_2",))
        for name in ("attn.out_proj", "mlp.c_fc", "mlp.c_proj"):
            jname = name.replace("attn.", "attn_").replace("mlp.", "mlp_")
            _lin(flat, sd, f"{tp}.{name}", jp + (jname,),
                 use_bias=(not bcosified) or use_bias)


def clip_visual_vit_teacher_to_variables(abstract, sd: Mapping[str, Any], layers: int):
    flat: FlatParams = {}
    _visual_vit_entries(flat, sd, layers, bcosified=False)
    return fill_variables(abstract, flat)


def clip_visual_vit_student_to_variables(
    abstract, sd: Mapping[str, Any], layers: int, *, use_bias: bool = False,
    scope: Tuple[str, ...] = ("model",),
):
    flat: FlatParams = {}
    _visual_vit_entries(flat, sd, layers, bcosified=True, use_bias=use_bias, scope=scope)
    return fill_variables(abstract, flat)


def build_bcosified_clip_vit_visual(
    model_config: Dict[str, Any],
    sd: Optional[Mapping[str, Any]] = None,
    cfg: Optional[dict] = None,
):
    """BEYOND-REFERENCE: bcosify a CLIP ViT image tower.

    The reference only B-cosifies CLIP-RN50 (clip_bcosification/model.py
    loads "RN50"); this applies the same recipe using the reference's ViT
    rules (bcosify_vit.py): patchify conv channel-doubled [w,-w]/2,
    Linear -> BcosifyLinear except the qkv in_proj, GELU gate detached,
    LayerNorms detachable (CLIPLayerNorm already is). The final ``proj``
    matrix and class/positional embeddings are kept (the attnpool pos-emb
    drop is an attention-pool-specific rewrite, not a ViT rule).
    """
    cfg = cfg or clip_model.config_from_state_dict(sd)
    assert not isinstance(cfg["vision_layers"], (tuple, list)), "ViT cfg expected"
    bargs = model_config.get("bcosify_args", {}) or {}
    b = model_config.get("bcos_args", {}).get("b", 2)
    use_bias = bool(bargs.get("use_bias", False))

    visual = clip_model.CLIPVisionTransformer(
        input_resolution=cfg["image_resolution"],
        patch_size=cfg["vision_patch_size"],
        width=cfg["vision_width"],
        layers=cfg["vision_layers"],
        heads=cfg["vision_width"] // 64,
        output_dim=cfg["embed_dim"],
        conv_layer=partial(BcosifyConv2d, b=float(b), use_bias=False),
        linear_layer=partial(BcosifyLinear, b=float(b), use_bias=use_bias),
        act_layer=partial(clip_model.QuickGELU, detach_gate=True),
        unpool=bool(model_config.get("attn_unpool", False)),
        name="model",
    )
    mean, std = normalization_for(
        clip_kd=True, bfy_mean_zero=bool(model_config.get("bfy_mean_zero", False))
    )
    net = BcosifyNetwork(model=visual, with_logit_layer=False, mean=mean, std=std)
    x0 = jnp.zeros((1, cfg["image_resolution"], cfg["image_resolution"], 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    if sd is None:
        variables = jax.jit(net.init)(
            jax.random.PRNGKey(model_config.get("seed", 0) or 0), x0
        )
    else:
        variables = clip_visual_vit_student_to_variables(
            abstract, sd, cfg["vision_layers"], use_bias=use_bias
        )
    return net, variables

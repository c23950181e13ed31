"""Released-checkpoint importer: B-cos `.pth` state dicts -> flax variables.

The reference's entrypoints download trained checkpoints at call time and
`model.load_state_dict` them (`/root/reference/bcos/models/pretrained.py:
92-127`); the checkpoints are plain ``state_dict()`` snapshots of the
from-scratch B-cos models (`bcos/models/{resnet,densenet,vgg,convnext,
vit}.py`, ViTs wrapped in ``BcosSequential(model, LogitLayer)`` by
`experiments/ImageNet/vit_final/model.py:46-48`).

This module is the flax side of that contract: given a registry entrypoint
name and a torch state dict, produce the entrypoint's parameter tree. The
key translation is the same rule set the per-family e2e oracles lock
value-for-value against the reference's own model code
(tests/test_e2e_{zoo,densenet_zoo,vgg,convnext}_b2_oracle.py,
tests/test_standard_vit_parity.py); here it is generalised over the full
registry and made strict: every flax leaf must be found in the state dict
and every state-dict tensor must be consumed (except torch's
``num_batches_tracked`` counters), so a renamed or missing key fails loudly
at conversion time instead of silently producing a half-random model.

Layout rules (design invariant: NHWC/HWIO everywhere):
- conv weights: OIHW -> HWIO via transpose(2, 3, 1, 0); B-cos convs live
  under ``<module>.linear.weight`` on the torch side, plain convs under
  ``<module>.weight``.
- linear weights: (out, in) -> (in, out) via ``.T``; B-cos linears under
  ``<module>.linear.weight`` (the patch embedding's is
  ``to_patch_embedding.linear.linear.weight``).
- norm affines / batch stats: copied as-is.
- ConvNeXt ``layer_scale``: torch stores (C, 1, 1); flax stores (C,).
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Callable, Dict, List, Mapping, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "convert_release_checkpoint",
    "convert_state_dict",
    "family_of",
    "load_torch_state_dict",
]


def _np(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu() if hasattr(x, "detach") else x)
    return arr.astype(np.float32) if arr.dtype == np.float64 else arr


def load_torch_state_dict(source: Union[str, Path, Mapping]) -> Dict[str, np.ndarray]:
    """Load a checkpoint into a flat {torch key: np.ndarray} mapping.

    Accepts an in-memory mapping, or a path to a ``torch.save``'d file.
    Unwraps the common ``{"state_dict": ...}`` / ``{"model": ...}`` nesting
    and strips DataParallel's ``module.`` prefix.
    """
    if isinstance(source, (str, Path)):
        import pickle

        import torch

        try:
            obj = torch.load(source, map_location="cpu", weights_only=True)
        except (pickle.UnpicklingError, RuntimeError):
            # weights_only rejects legacy formats / pickled wrapper objects
            # with UnpicklingError (or RuntimeError on older torch). Only
            # those fall back to full unpickling; IO/corruption errors keep
            # their original diagnostic (and a crafted file can't route
            # itself into the unsafe loader via an arbitrary exception).
            obj = torch.load(source, map_location="cpu")
    else:
        obj = source
    for nest in ("state_dict", "model"):
        if isinstance(obj, Mapping) and nest in obj and isinstance(obj[nest], Mapping):
            obj = obj[nest]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _np(v)
    return out


# -----------------------------------------------------------------------------
# per-family flax-scope -> torch-module-path translators
# -----------------------------------------------------------------------------

def _tpath_resnet(scope: Sequence[str]) -> str:
    out: List[str] = []
    for s in scope:
        if s.startswith("layer") and "_" in s:
            stage, j = s.split("_")
            out += [stage, j]
        elif s == "downsample_conv":
            out += ["downsample", "0"]
        elif s == "downsample_norm":
            out += ["downsample", "1"]
        else:
            out.append(s)  # conv1 / bn1 / fc
    return ".".join(out)


def _tpath_densenet(scope: Sequence[str]) -> str:
    out: List[str] = []
    for s in scope:
        if s.startswith("denseblock"):
            i, j = s.split("_")
            out.append(f"features.{i}.{j}")
        elif s.startswith("transition") or s in ("conv0", "norm0", "norm5"):
            out.append(f"features.{s}")
        else:
            out.append(s)  # norm1/conv1/norm2/conv2/norm/conv/classifier
    return ".".join(out)


def _make_tpath_vgg(cfg: Sequence, with_norm: bool) -> Callable:
    """Our features_{i} skips pool entries (and, without norms, the
    reference's paramless Identity placeholders — make_layers appends
    ``norm_layer(v)`` unconditionally, vgg.py:174-177, and ``nn.Identity``
    swallows the argument); the reference Sequential counts every module."""
    ours_to_ref: Dict[str, str] = {}
    ref_idx = our_idx = 0
    for v in cfg:
        if v == "M":
            ref_idx += 1  # AvgPool2d consumes a Sequential slot
            continue
        ours_to_ref[f"features_{our_idx}"] = f"features.{ref_idx}"  # conv
        if with_norm:
            ours_to_ref[f"features_{our_idx + 1}"] = f"features.{ref_idx + 1}"
            our_idx += 2
        else:
            our_idx += 1
        ref_idx += 2  # norm OR Identity placeholder follows every conv
    for i in range(3):
        ours_to_ref[f"classifier_{i}"] = f"classifier.{i}"

    def tpath(scope: Sequence[str]) -> str:
        return ".".join(ours_to_ref.get(s, s) for s in scope)

    return tpath


def _make_tpath_convnext(downsampled_stages: Sequence[bool]) -> Callable:
    """torch features Sequential: stem conv+norm occupy 0/1; each stage
    occupies one slot, plus one for its norm+conv downsampling pair."""

    def feature_idx(si: int) -> int:
        return 2 + sum(2 if d else 1 for d in downsampled_stages[:si])

    def tpath(scope: Sequence[str]) -> str:
        out: List[str] = []
        for s in scope:
            if s == "stem_conv":
                out.append("features.0")
            elif s == "stem_norm":
                out.append("features.1")
            elif s.startswith("stage"):
                si, bi = s[len("stage"):].split("_block")
                out.append(f"features.{feature_idx(int(si))}.{bi}")
            elif s.startswith("down") and s.endswith("_norm"):
                out.append(f"features.{feature_idx(int(s[4:-5])) + 1}.0")
            elif s.startswith("down") and s.endswith("_conv"):
                out.append(f"features.{feature_idx(int(s[4:-5])) + 1}.1")
            elif s.startswith("block_"):
                out.append(f"block.{s[len('block_'):]}")
            elif s == "classifier_norm":
                out.append("classifier.0")
            elif s == "classifier_conv":
                out.append("classifier.1")
            else:
                out.append(s)
        return ".".join(out)

    return tpath


def _make_tpath_vit(prefix: str) -> Callable:
    """prefix is ``"0."`` for the released B-cos ViTs (BcosSequential wraps
    (SimpleViT, LogitLayer), vit_final/model.py:46-48) and ``""`` for the
    standard_* checkpoints (bare SimpleViT)."""

    def tpath(scope: Sequence[str]) -> str:
        out: List[str] = []
        for s in scope:
            if s.startswith("conv_stem_"):
                out.append(f"to_patch_embedding.conv_stem.{s[len('conv_stem_'):]}")
            elif s == "to_patch_embedding_linear":
                out.append("to_patch_embedding.linear")
            elif s.startswith("encoder_"):
                out.append(f"transformer.{s}")
            elif s == "ff":
                out.append("ff.net")
            elif s == "linear_head_norm":
                out.append("linear_head.norm")
            elif s == "linear_head_linear":
                out.append("linear_head.linear")
            else:
                out.append(s)
        return prefix + ".".join(out)

    return tpath


# -----------------------------------------------------------------------------
# family detection + generic fill
# -----------------------------------------------------------------------------

def family_of(name: str) -> str:
    base = name[len("standard_"):] if name.startswith("standard_") else name
    if base.startswith(("resnet", "resnext", "wide_resnet")):
        return "resnet"
    if base.startswith("densenet"):
        return "densenet"
    if base.startswith("vgg"):
        return "vgg"
    if base.startswith("convnext"):
        return "convnext"
    if base.startswith(("simple_vit", "vitc")):
        return "vit"
    raise ValueError(f"no released-checkpoint family for entrypoint {name!r}")


def _tpath_for(name: str, abstract) -> Callable:
    family = family_of(name)
    if family == "resnet":
        return _tpath_resnet
    if family == "densenet":
        return _tpath_densenet
    if family == "vgg":
        from bcosification_tpu.models.vgg import CFGS

        letter = {"11": "A", "13": "B", "16": "D", "19": "E"}[
            re.search(r"vgg(\d+)", name).group(1)
        ]
        scopes = {
            p[1].key
            for p, _ in jax.tree_util.tree_flatten_with_path(abstract)[0]
            if len(p) > 1 and hasattr(p[1], "key")
        }
        n_convs = sum(1 for v in CFGS[letter] if v != "M")
        with_norm = len([s for s in scopes if s.startswith("features_")]) == 2 * n_convs
        return _make_tpath_vgg(CFGS[letter], with_norm)
    if family == "convnext":
        scopes = {
            p[1].key
            for p, _ in jax.tree_util.tree_flatten_with_path(abstract)[0]
            if len(p) > 1 and hasattr(p[1], "key")
        }
        n_stages = 1 + max(
            int(s[len("stage"):].split("_block")[0])
            for s in scopes
            if s.startswith("stage")
        )
        downsampled = [f"down{si}_conv" in scopes for si in range(n_stages)]
        return _make_tpath_convnext(downsampled)
    # vit: the released B-cos checkpoints carry the BcosSequential "0." prefix
    return _make_tpath_vit("" if name.startswith("standard_") else "0.")


def convert_state_dict(abstract, sd: Mapping[str, np.ndarray], tpath: Callable):
    """Fill ``abstract`` (a tree of ShapeDtypeStructs or arrays) from a torch
    state dict using scope translator ``tpath``. Strict both ways."""
    used = set()

    def take(candidates: Sequence[str]) -> np.ndarray:
        for key in candidates:
            if key in sd:
                used.add(key)
                return sd[key]
        raise KeyError(
            f"none of {list(candidates)} found in the checkpoint "
            f"(nearest keys: {sorted(k for k in sd if k.startswith(candidates[-1].split('.')[0]))[:5]})"
        )

    def fill(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        coll, scope, name = keys[0], keys[1:-1], keys[-1]
        tp = tpath(scope)
        if coll == "batch_stats":
            if name == "num_batches_tracked":
                return jnp.zeros(leaf.shape, leaf.dtype)
            arr = take([f"{tp}.{name}"])
        elif name == "layer_scale":
            arr = take([f"{tp}.layer_scale"]).reshape(leaf.shape)
        elif name == "weight" and leaf.ndim == 4:  # conv HWIO <- OIHW
            arr = np.transpose(take([f"{tp}.linear.weight", f"{tp}.weight"]), (2, 3, 1, 0))
        elif name == "weight" and leaf.ndim == 2:  # linear (in,out) <- (out,in)
            arr = take([f"{tp}.linear.weight", f"{tp}.weight"]).T
        else:  # norm affine weight/bias, linear bias, pos embeddings
            arr = take([f"{tp}.{name}"])
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(keys)}: checkpoint {arr.shape}, "
                f"model {leaf.shape}"
            )
        return jnp.asarray(arr, dtype=leaf.dtype)

    variables = jax.tree_util.tree_map_with_path(fill, abstract)
    # torch BatchNormUncentered2d keeps a zero running_mean buffer it never
    # reads (uncentered norms divide by running_var only; ref
    # uncentered_norms/batchnorm_uncentered.py) — our flax BNU stores var
    # only, so an unconsumed running_mean is fine iff its var WAS consumed.
    leftover = {
        k
        for k in sd
        if k not in used
        and not k.endswith("num_batches_tracked")
        and not (
            k.endswith("running_mean")
            and k[: -len("mean")] + "var" in used
        )
    }
    if leftover:
        raise KeyError(
            f"{len(leftover)} checkpoint tensors were not consumed: "
            f"{sorted(leftover)[:10]}..."
        )
    return variables


def convert_release_checkpoint(
    name: str,
    source: Union[str, Path, Mapping],
    rebuild_norm: bool = True,
    return_model: bool = False,
    **model_kwargs,
):
    """Entry point: registry name + released checkpoint -> flax variables.

    The abstract tree comes from the registry entrypoint itself (so the
    conversion target is exactly what ``load_model(name)`` builds), via
    ``abstract_init`` — no real initialisation is paid just to overwrite it.

    If the checkpoint carries BatchNorm running stats but the entrypoint's
    default norm is stat-less (or vice versa), the CNN families are rebuilt
    once with the matching uncentered norm — the released zoo shipped both
    position-norm and BNU trainings under one architecture name
    (ref pretrained.py:616-706 `_bnu` vs `_pn` variants). Callers that need
    the converted variables to fit the entrypoint's DEFAULT build exactly
    (e.g. the npz cache behind ``load_model(..., pretrained=True)``) pass
    ``rebuild_norm=False`` so a flavour mismatch fails loudly here instead
    of producing a tree the default model cannot consume.

    ``return_model=True`` returns ``(model, variables)`` with the flax model
    the conversion actually targeted (which differs from the registry
    default when the rebuild branch fired) — required for running the
    converted weights, since a rebuilt-flavour tree under a default-flavour
    model would silently compute the wrong norm.
    """
    from bcosification_tpu.models.pretrained import load_model
    from bcosification_tpu.utils.init_mode import abstract_init

    sd = load_torch_state_dict(source)
    with abstract_init():
        model, abstract = load_model(name, pretrained=False, **model_kwargs)
        sd_has_stats = any(k.endswith("running_var") for k in sd)
        tree_has_stats = isinstance(abstract, Mapping) and "batch_stats" in abstract
        if (
            rebuild_norm
            and sd_has_stats != tree_has_stats
            and family_of(name) in ("resnet", "densenet", "convnext")
            and "norm_layer" not in model_kwargs
        ):
            from bcosification_tpu.modules import norms

            norm = norms.NoBias(
                norms.BatchNormUncentered2d
                if sd_has_stats
                else norms.DetachablePositionNorm2d
            )
            model, abstract = load_model(
                name, pretrained=False, norm_layer=norm, **model_kwargs
            )
    variables = convert_state_dict(abstract, sd, _tpath_for(name, abstract))
    return (model, variables) if return_model else variables

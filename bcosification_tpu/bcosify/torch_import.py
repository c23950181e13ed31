"""torch state_dict -> flax variables importers.

Converts foreign checkpoints (torchvision CNNs, B-cos hub ViTs, OpenAI CLIP)
into this framework's parameter trees, applying the B-cosification transforms
(bcosify/params.py) in the reference's order: add_channels BEFORE bcosify
(bcosify.py:46-48).

The importers are pure: state_dict in (any mapping str -> array-like),
flax variables out. No torch dependency at runtime — tensors are converted
via np.asarray (works for torch CPU tensors and numpy arrays alike).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.bcosify import params as P

__all__ = [
    "fill_variables",
    "resnet_torch_to_variables",
    "densenet_torch_to_variables",
    "simple_vit_torch_to_variables",
    "variables_from_npz",
    "FlatParams",
]

FlatParams = Dict[Tuple[str, ...], np.ndarray]


def _np(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu() if hasattr(x, "detach") else x)
    return arr.astype(np.float32) if arr.dtype == np.float64 else arr


def variables_from_npz(path, variables):
    """Load a strip_checkpoints/export npz ({'a/b/c': array} keys) into the
    shape of ``variables``. The single npz->variables path shared by
    models/pretrained._load_weights_npz and evaluate.py --weights (r5
    review: the two copies had already drifted on allow_pickle)."""
    import jax

    loaded = dict(np.load(path))  # plain arrays only: never allow_pickle
    flat = {tuple(k.split("/")): v for k, v in loaded.items()}
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables
    )
    return fill_variables(abstract, flat)


def fill_variables(abstract_variables, flat: FlatParams, strict: bool = True):
    """Fill an eval_shape'd variables tree from a flat {path: array} mapping.

    Every leaf must be provided (strict) and shapes must match — catching both
    missing and mis-mapped keys at conversion time.
    """
    flat_abstract = jax.tree_util.tree_flatten_with_path(abstract_variables)
    leaves, treedef = flat_abstract
    out = []
    used = set()
    for path, leaf in leaves:
        key = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        if key not in flat:
            if strict:
                raise KeyError(
                    f"missing parameter {'/'.join(key)}; provided: "
                    f"{sorted('/'.join(k) for k in flat)[:10]}..."
                )
            out.append(jnp.zeros(leaf.shape, leaf.dtype))
            continue
        arr = flat[key]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {'/'.join(key)}: got {arr.shape}, "
                f"expected {leaf.shape}"
            )
        used.add(key)
        out.append(jnp.asarray(arr, dtype=leaf.dtype))
    unused = set(flat) - used
    if strict and unused:
        raise KeyError(f"unused imported parameters: {sorted('/'.join(k) for k in unused)}")
    return jax.tree_util.tree_unflatten(treedef, out)


def _bn_entries(
    flat: FlatParams,
    tsd: Mapping[str, Any],
    torch_prefix: str,
    jax_name: Tuple[str, ...],
    fold_bias: bool,
    use_bias: bool,
    eps: float = 1e-5,
):
    """Import one BatchNorm2d -> BatchNormUncentered2d (with BnUncV2 bias fold
    when fold_bias, batchnorm_uncentered.py:117-141)."""
    w = _np(tsd[f"{torch_prefix}.weight"])
    b = _np(tsd[f"{torch_prefix}.bias"])
    mean = _np(tsd[f"{torch_prefix}.running_mean"])
    var = _np(tsd[f"{torch_prefix}.running_var"])
    flat[("params",) + jax_name + ("weight",)] = w
    if use_bias:
        flat[("params",) + jax_name + ("bias",)] = (
            P.bn_uncentered_fold_bias(b, mean, var, w, eps) if fold_bias else b
        )
    flat[("batch_stats",) + jax_name + ("running_var",)] = var
    flat[("batch_stats",) + jax_name + ("num_batches_tracked",)] = _np(
        tsd.get(f"{torch_prefix}.num_batches_tracked", np.zeros((), np.int32))
    )


def resnet_torch_to_variables(
    abstract_variables,
    tsd: Mapping[str, Any],
    layers: Tuple[int, ...],
    *,
    add_channels: bool = True,
    fold_bn_bias: bool = True,
    use_bias: bool = False,
    backbone_scope: Tuple[str, ...] = ("model",),
    bn_eps: float = 1e-5,
):
    """Import a torchvision ResNet state_dict into a bcosified BcosResNet.

    ``abstract_variables``: jax.eval_shape(model.init, ...) output of the
    target BcosifyNetwork(BcosResNet(...)) model.
    ``use_bias``: keep (folded) BN biases + fc bias — the reference's final
    recipe removes all biases (`ImageNet/bcosification/model.py:51-55`), but
    keeping them makes the b=1 conversion numerically exact (test oracle).
    """
    flat: FlatParams = {}
    S = backbone_scope

    conv1 = P.torch_conv_weight(tsd["conv1.weight"])
    if add_channels:
        conv1 = P.add_channels_conv_weight(conv1)
    flat[("params",) + S + ("conv1", "weight")] = conv1
    _bn_entries(flat, tsd, "bn1", S + ("bn1",), fold_bn_bias, use_bias, bn_eps)

    for stage, n_blocks in enumerate(layers):
        for j in range(n_blocks):
            tp = f"layer{stage + 1}.{j}"
            jp = S + (f"layer{stage + 1}_{j}",)
            k = 1
            while f"{tp}.conv{k}.weight" in tsd:
                flat[("params",) + jp + (f"conv{k}", "weight")] = P.torch_conv_weight(
                    tsd[f"{tp}.conv{k}.weight"]
                )
                _bn_entries(
                    flat, tsd, f"{tp}.bn{k}", jp + (f"bn{k}",), fold_bn_bias, use_bias, bn_eps
                )
                k += 1
            if f"{tp}.downsample.0.weight" in tsd:
                flat[("params",) + jp + ("downsample_conv", "weight")] = (
                    P.torch_conv_weight(tsd[f"{tp}.downsample.0.weight"])
                )
                _bn_entries(
                    flat,
                    tsd,
                    f"{tp}.downsample.1",
                    jp + ("downsample_norm",),
                    fold_bn_bias,
                    use_bias,
                    bn_eps,
                )

    # fc (Linear) -> 1x1 conv, GAP-reorder (bcosifyconv2d.py:151-182)
    flat[("params",) + S + ("fc", "weight")] = P.linear_to_conv1x1_weight(
        P.torch_linear_weight(tsd["fc.weight"])
    )
    if use_bias and "fc.bias" in tsd:
        flat[("params",) + S + ("fc", "bias")] = _np(tsd["fc.bias"])

    return fill_variables(abstract_variables, flat)


def densenet_torch_to_variables(
    abstract_variables,
    tsd: Mapping[str, Any],
    block_config: Tuple[int, ...],
    *,
    add_channels: bool = True,
    fold_bn_bias: bool = True,
    use_bias: bool = False,
    backbone_scope: Tuple[str, ...] = ("model",),
    bn_eps: float = 1e-5,
):
    """Import a torchvision DenseNet state_dict into a bcosified BcosDenseNet.

    torchvision key scheme: features.conv0 / norm0 / denseblockI.denselayerJ.
    {norm1,conv1,norm2,conv2} / transitionI.{norm,conv} / norm5 / classifier.
    """
    flat: FlatParams = {}
    S = backbone_scope

    conv0 = P.torch_conv_weight(tsd["features.conv0.weight"])
    if add_channels:
        conv0 = P.add_channels_conv_weight(conv0)
    flat[("params",) + S + ("conv0", "weight")] = conv0
    _bn_entries(flat, tsd, "features.norm0", S + ("norm0",), fold_bn_bias, use_bias, bn_eps)

    for i, num_layers in enumerate(block_config):
        for j in range(num_layers):
            tp = f"features.denseblock{i + 1}.denselayer{j + 1}"
            jp = S + (f"denseblock{i + 1}_denselayer{j + 1}",)
            for k in (1, 2):
                _bn_entries(
                    flat, tsd, f"{tp}.norm{k}", jp + (f"norm{k}",), fold_bn_bias,
                    use_bias, bn_eps,
                )
                flat[("params",) + jp + (f"conv{k}", "weight")] = P.torch_conv_weight(
                    tsd[f"{tp}.conv{k}.weight"]
                )
        if i != len(block_config) - 1:
            tp = f"features.transition{i + 1}"
            jp = S + (f"transition{i + 1}",)
            _bn_entries(flat, tsd, f"{tp}.norm", jp + ("norm",), fold_bn_bias, use_bias, bn_eps)
            flat[("params",) + jp + ("conv", "weight")] = P.torch_conv_weight(
                tsd[f"{tp}.conv.weight"]
            )

    _bn_entries(flat, tsd, "features.norm5", S + ("norm5",), fold_bn_bias, use_bias, bn_eps)
    flat[("params",) + S + ("classifier", "weight")] = P.linear_to_conv1x1_weight(
        P.torch_linear_weight(tsd["classifier.weight"])
    )
    if use_bias and "classifier.bias" in tsd:
        flat[("params",) + S + ("classifier", "bias")] = _np(tsd["classifier.bias"])

    return fill_variables(abstract_variables, flat)


def _ln_entries(flat, tsd, torch_prefix, jax_name, use_bias):
    flat[("params",) + jax_name + ("weight",)] = _np(tsd[f"{torch_prefix}.weight"])
    if use_bias and f"{torch_prefix}.bias" in tsd:
        flat[("params",) + jax_name + ("bias",)] = _np(tsd[f"{torch_prefix}.bias"])


def _lin_entries(flat, tsd, torch_prefix, jax_name, use_bias):
    flat[("params",) + jax_name + ("weight",)] = P.torch_linear_weight(
        tsd[f"{torch_prefix}.weight"]
    )
    if use_bias and f"{torch_prefix}.bias" in tsd:
        flat[("params",) + jax_name + ("bias",)] = _np(tsd[f"{torch_prefix}.bias"])


def simple_vit_torch_to_variables(
    abstract_variables,
    tsd: Mapping[str, Any],
    depth: int,
    *,
    add_channels: bool = True,
    use_bias: bool = False,
    backbone_scope: Tuple[str, ...] = ("model",),
):
    """Import a B-cos-v2 hub *standard* SimpleViT state_dict into the
    bcosified SimpleViT (bcosify_vit.py:84-154).

    add_channels doubles the patch-embedding linear's input rows per 3-channel
    pixel group ([w/2, -w/2], bcosify_vit.py:94-121); to_qkv stays a plain
    Linear (bcosify_vit.py:138).
    """
    flat: FlatParams = {}
    S = backbone_scope

    w = P.torch_linear_weight(tsd["to_patch_embedding.linear.weight"])
    if add_channels:
        w = P.vit_patchify_linear_add_channels(w, w.shape[0])
    flat[("params",) + S + ("to_patch_embedding_linear", "weight")] = w
    if use_bias and "to_patch_embedding.linear.bias" in tsd:
        flat[("params",) + S + ("to_patch_embedding_linear", "bias")] = _np(
            tsd["to_patch_embedding.linear.bias"]
        )

    for i in range(depth):
        tp = f"transformer.encoder_{i}"
        jp = S + (f"encoder_{i}",)
        _ln_entries(flat, tsd, f"{tp}.attn.norm", jp + ("attn", "norm"), use_bias)
        _lin_entries(flat, tsd, f"{tp}.attn.to_qkv", jp + ("attn", "to_qkv"), False)
        _lin_entries(flat, tsd, f"{tp}.attn.to_out", jp + ("attn", "to_out"), False)
        _ln_entries(flat, tsd, f"{tp}.ff.net.norm", jp + ("ff", "norm"), use_bias)
        _lin_entries(flat, tsd, f"{tp}.ff.net.linear1", jp + ("ff", "linear1"), use_bias)
        _lin_entries(flat, tsd, f"{tp}.ff.net.linear2", jp + ("ff", "linear2"), use_bias)

    _ln_entries(flat, tsd, "linear_head.norm", S + ("linear_head_norm",), use_bias)
    _lin_entries(flat, tsd, "linear_head.linear", S + ("linear_head_linear",), use_bias)

    return fill_variables(abstract_variables, flat)

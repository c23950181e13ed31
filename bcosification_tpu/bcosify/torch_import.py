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
    "FlatParams",
]

FlatParams = Dict[Tuple[str, ...], np.ndarray]


def _np(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu() if hasattr(x, "detach") else x)
    return arr.astype(np.float32) if arr.dtype == np.float64 else arr


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

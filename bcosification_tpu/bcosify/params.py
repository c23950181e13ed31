"""Pure parameter transforms of the B-cosification conversion.

The reference rewrites a live torch module tree (`/root/reference/bcosify.py`);
here conversion is PyTree surgery: each transform is a pure function on arrays,
unit-testable and exact.

Layouts: conv weights HWIO, linear weights (in, out). Torch tensors must be
converted first (see torch_import.torch_conv_weight / torch_linear_weight).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "add_channels_conv_weight",
    "bn_uncentered_fold_bias",
    "linear_to_conv1x1_weight",
    "vit_patchify_linear_add_channels",
    "torch_conv_weight",
    "torch_linear_weight",
]

Array = jnp.ndarray


def torch_conv_weight(w) -> np.ndarray:
    """torch OIHW -> HWIO."""
    w = np.asarray(w)
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def torch_linear_weight(w) -> np.ndarray:
    """torch (out, in) -> (in, out)."""
    w = np.asarray(w)
    return np.ascontiguousarray(w.T)


def add_channels_conv_weight(w: np.ndarray) -> np.ndarray:
    """First-conv 3->6 channel doubling: w' = [w, -w] / 2 on the input-channel
    axis (bcosify.py:55-72).

    Exact-equivalence property: for AddInverse-normalised input
    [z, -z] (z = (x-mean)/std), conv(w', [z,-z]) == conv(w, z).
    HWIO: input channels are axis 2.
    """
    assert w.shape[2] == 3, f"expected 3 input channels, got {w.shape}"
    return np.concatenate([w, -w], axis=2) / 2.0


def bn_uncentered_fold_bias(
    bias: np.ndarray,
    running_mean: np.ndarray,
    running_var: np.ndarray,
    weight: np.ndarray,
    eps: float = 1e-5,
) -> np.ndarray:
    """BnUncV2 bias fold (batchnorm_uncentered.py:131-136): replacing centered
    BN by uncentered BN is exact in eval mode with
    b' = b - (mu / sqrt(var + eps)) * gamma."""
    std = np.sqrt(np.asarray(running_var) + eps)
    return np.asarray(bias) - (np.asarray(running_mean) / std) * np.asarray(weight)


def linear_to_conv1x1_weight(w: np.ndarray) -> np.ndarray:
    """(in, out) linear weight -> (1, 1, in, out) conv kernel — the GAP-reorder
    fc replacement (bcosifyconv2d.py:151-182)."""
    assert w.ndim == 2
    return w.reshape(1, 1, *w.shape)


def vit_patchify_linear_add_channels(w: np.ndarray, patch_numel_rgb: int) -> np.ndarray:
    """Channel-double a *linear* patch-embedding weight (bcosify_vit.py:84-125).

    The torch ViT patchifier flattens each patch (3*p*p values, channel-major
    groups of 3) into the linear input dim; doubling interleaves the negated
    copy per pixel so the 6-channel flattened patch ([r,g,b,1-r,...] per pixel)
    maps exactly: rows become [w_pix/2, -w_pix/2] per 3-channel pixel group.

    w: (in=3*p*p, out). Returns (2*in, out). ``patch_numel_rgb`` = 3*p*p.
    """
    in_dim, out = w.shape
    assert in_dim == patch_numel_rgb and in_dim % 3 == 0
    # groups of 3 consecutive input rows (one pixel's RGB)
    w3 = w.reshape(in_dim // 3, 3, out)
    doubled = np.concatenate([w3 / 2.0, -w3 / 2.0], axis=1)  # (pix, 6, out)
    return doubled.reshape(2 * in_dim, out)

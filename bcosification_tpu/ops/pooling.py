"""Pooling ops with torch-compatible semantics, NHWC.

Used for the torchvision-surgery paths (maxpool->AvgPool2d standard change,
`/root/reference/bcos/experiments/ImageNet/bcosification/experiment_parameters.py:99`)
and the GAP-reorder forwards."""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from bcosification_tpu.ops.bcos import IntOrPair, _pad_pairs, _pair

__all__ = ["avg_pool2d", "max_pool2d", "adaptive_avg_pool2d", "global_avg_pool"]


def avg_pool2d(
    x: jax.Array,
    kernel_size: IntOrPair,
    stride: IntOrPair = None,
    padding: IntOrPair = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    """torch F.avg_pool2d (count_include_pad=True default: divide by the full
    kernel area including zero padding)."""
    kh, kw = _pair(kernel_size)
    stride = kernel_size if stride is None else stride
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, *_pair(stride), 1),
        padding=((0, 0), *_pad_pairs(padding), (0, 0)),
    )
    if count_include_pad:
        return summed / (kh * kw)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, ..., None]
    counts = lax.reduce_window(
        ones,
        0.0,
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, *_pair(stride), 1),
        padding=((0, 0), *_pad_pairs(padding), (0, 0)),
    )
    return summed / counts


def max_pool2d(
    x: jax.Array,
    kernel_size: IntOrPair,
    stride: IntOrPair = None,
    padding: IntOrPair = 0,
) -> jax.Array:
    """torch F.max_pool2d (padding with -inf)."""
    kh, kw = _pair(kernel_size)
    stride = kernel_size if stride is None else stride
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, *_pair(stride), 1),
        padding=((0, 0), *_pad_pairs(padding), (0, 0)),
    )


def adaptive_avg_pool2d(x: jax.Array, output_size: IntOrPair = 1) -> jax.Array:
    """torch F.adaptive_avg_pool2d, only for output_size dividing input."""
    oh, ow = _pair(output_size)
    n, h, w, c = x.shape
    assert h % oh == 0 and w % ow == 0, (x.shape, output_size)
    return x.reshape(n, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))


def global_avg_pool(x: jax.Array, keepdims: bool = False) -> jax.Array:
    return x.mean(axis=(1, 2), keepdims=keepdims)

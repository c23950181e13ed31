"""Fused 1x1 B-cos conv + uncentered-BN(eval) + ReLU — Pallas TPU kernels.

The RN50 explain path is HBM-bandwidth-bound (measured ~215 MB/img vs an
11 ms compute floor, scripts/perf_probe.py). Two thirds of the bcosified
ResNet's layers are 1x1 B-cos convs followed by BatchNormUncentered2d (eval:
per-channel multiply) and ReLU:

    u = x @ w [+ bias];  n = sqrt(ssq(x) + eps);  y = (|u|/n) * u
    z = y * mult + add;  a = relu(z)                       (b = 2)

XLA runs this as conv + elementwise fusions, re-reading activations and
saving activation-sized residuals for the VJP. These kernels do:

- forward: one pass over x feeding the MXU, f32 scratch accumulation over K
  tiles, the whole epilogue in registers, ONE bf16 output (a). The row
  sum-of-squares comes in as a [M,1] f32 operand (the model's
  `channel_sumsq` hint — computed in the producer's epilogue).
- backward (explanation mode): residual-free — recomputes u = x@w and the
  detached scale with plain XLA matmuls in the custom VJP (saves only the
  layer input and output). A single-kernel Pallas backward
  (_pallas_bwd_explain) is kept as a RETIRED EXPERIMENT — it re-DMAs the
  weight block per grid step and measured slower; the live VJP is
  _fused_tpu_bwd below.

Non-TPU / odd shapes fall back to a pure-jnp path whose autodiff handles
both explain modes, so CPU tests exercise identical semantics.

MEASURED (v5e, JAX 0.9, RN50 fwd+explain bf16 batch 128): the kernel itself
is fine in isolation (505 GB/s effective on the layer2-conv1 shape), but
end-to-end the fused path runs at ~2100 img/s vs 4120 for plain XLA: the
compiled module shows 7.5 GB/step of `copy`/`copy-start` (311 ops) — XLA
re-lays out every activation crossing a Pallas custom-call boundary, because
the surrounding convolutions use conv-tiled layouts Mosaic doesn't accept.
Until the toolchain can agree on layouts across the boundary (or the whole
network is Pallas), this stays an opt-in (BCOS_FUSED=1) native-kernel path;
the production default is the XLA graph. Grid note: tile the grid over M
only — a (M, N, K) grid re-streams the weight block once per M-tile
(measured equally slow).

Reference semantics: bcosconv2d.py:153-231 (b=2 fast path + patch norms with
eps inside sqrt), batchnorm_uncentered.py:21-141 (eval: divide by running
std, affine), detach placement bcosconv2d.py:181-193.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False

__all__ = ["bcos_conv1x1_bn_act", "fused_enabled", "fusion_requested"]

CONV_NORM_EPS = 1e-6


def fusion_requested() -> bool:
    """BCOS_FUSED=1: models route conv+BN+act through bcos_conv1x1_bn_act
    (Pallas on TPU, equivalent jnp elsewhere)."""
    return os.getenv("BCOS_FUSED", "0") == "1"


def fused_enabled() -> bool:
    """Pallas-kernel dispatch: opt-in + TPU + pallas availability."""
    return fusion_requested() and HAS_PALLAS and jax.default_backend() == "tpu"


def _cdiv(a, b):
    return -(-a // b)


# -----------------------------------------------------------------------------
# forward kernel
# -----------------------------------------------------------------------------
def _fwd_kernel(x_ref, w_ref, ssq_ref, mult_ref, add_ref, out_ref,
                *, eps: float, relu: bool):
    u = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    n = jnp.sqrt(ssq_ref[...] + eps)  # [TM, 1] f32
    z = (jnp.abs(u) / n) * u * mult_ref[...] + add_ref[...]
    if relu:
        z = jnp.maximum(z, 0.0)
    out_ref[...] = z.astype(out_ref.dtype)


def _pallas_fwd(x2, w, ssq, mult, add, *, eps, relu, tm):
    # Grid over M only; the [K, N] weight block is constant across steps so
    # it stays VMEM-resident (tiling the grid over (j, k) instead re-streams
    # the weights once per M-tile — measured 2x end-to-end slowdown).
    m, k = x2.shape
    n = w.shape[1]
    grid = (_cdiv(m, tm),)
    kernel = functools.partial(_fwd_kernel, eps=eps, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((tm, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
    )(x2, w, ssq, mult, add)


# -----------------------------------------------------------------------------
# RETIRED EXPERIMENT: single-kernel backward (dx tile directly, u recomputed
# on the MXU). Not used by _fused_tpu's VJP — it re-streams the weight block
# per M-tile and measured slower than the XLA-matmul backward below. Kept for
# future tuning if Mosaic gains cross-iteration block residency guarantees.
# -----------------------------------------------------------------------------
def _bwd_kernel(x_ref, w_ref, ssq_ref, mult_ref, ct_ref, a_ref, dx_ref,
                *, eps: float, relu: bool):
    u = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    n = jnp.sqrt(ssq_ref[...] + eps)
    scale = jnp.abs(u) / n  # detached dynamic-linear factor
    g = ct_ref[...].astype(jnp.float32) * mult_ref[...]
    if relu:
        # compare in f32: bf16 cmpf doesn't lower on this mosaic version
        g = jnp.where(a_ref[...].astype(jnp.float32) > 0.0, g, 0.0)
    g = (g * scale).astype(x_ref.dtype)
    # dx[TM, K] = g[TM, N] @ w[K, N]^T  (contract over N)
    dx_ref[...] = lax.dot_general(
        g, w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _pallas_bwd_explain(x2, w, ssq, mult, ct, a, *, eps, relu, tm):
    m, k = x2.shape
    n = w.shape[1]
    grid = (_cdiv(m, tm),)
    kernel = functools.partial(_bwd_kernel, eps=eps, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((tm, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((tm, n), lambda i: (i, 0)),
            pl.BlockSpec((tm, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x2.dtype),
    )(x2, w, ssq, mult, ct, a)


# -----------------------------------------------------------------------------
# jnp reference (fallback + CPU tests; autodiff covers both explain modes)
# -----------------------------------------------------------------------------
def _jnp_path(x4, w, bias, mult, add, relu, eps, explain, x_sumsq, train=False):
    from bcosification_tpu.ops import bcos as _ops

    # routed through ops.bcos._conv so the BCOS_INT8 serving path (value
    # forwards only) covers the bottlenecks' 1x1 convs too; train-mode
    # forwards must never quantize (round() has zero gradient, and a
    # forward-only train pass would silently absorb ~7% quantization error)
    u = _ops._conv(
        x4, w.reshape(1, 1, *w.shape).astype(x4.dtype),
        (1, 1), (0, 0), (1, 1), 1, allow_int8=not explain and not train,
    )
    if bias is not None:
        u = u + jnp.reshape(bias, (1, 1, 1, -1)).astype(u.dtype)
    ssq = (
        x_sumsq.astype(jnp.float32)
        if x_sumsq is not None
        else jnp.sum(jnp.square(x4.astype(jnp.float32)), axis=-1, keepdims=True)
    )
    n = jnp.sqrt(ssq + eps).astype(u.dtype)
    stop = lax.stop_gradient if explain else (lambda v: v)
    y = (jnp.abs(stop(u)) / stop(n)) * u
    z = y * jnp.reshape(mult, (1, 1, 1, -1)).astype(y.dtype)
    if add is not None:
        z = z + jnp.reshape(add, (1, 1, 1, -1)).astype(z.dtype)
    if relu:
        from bcosification_tpu.ops import guided

        z = guided.relu(z)
    return z


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_tpu(x4, w, ssq, mult, add, relu: bool, eps: float):
    n_, h_, w_, c = x4.shape
    x2 = x4.reshape(-1, c)
    m = x2.shape[0]
    tm = 512 if m % 512 == 0 else (256 if m % 256 == 0 else 128)
    out = _pallas_fwd(
        x2, w, ssq.reshape(-1, 1).astype(jnp.float32),
        mult.reshape(1, -1).astype(jnp.float32),
        add.reshape(1, -1).astype(jnp.float32),
        eps=eps, relu=relu, tm=tm,
    )
    return out.reshape(n_, h_, w_, -1)


def _fused_tpu_fwd(x4, w, ssq, mult, add, relu, eps):
    out = _fused_tpu(x4, w, ssq, mult, add, relu, eps)
    return out, (x4, w, ssq, mult, add, out)


def _fused_tpu_bwd(relu, eps, res, ct):
    # XLA matmuls (pipelined far better than the naive _pallas_bwd_explain,
    # which re-DMAs w per grid step): recompute u on the MXU, rebuild the
    # detached scale, contract back. Still residual-free: saves (x, out) only.
    x4, w, ssq, mult, add, out = res
    c = x4.shape[-1]
    x2 = x4.reshape(-1, c)
    u = jnp.dot(x2, w)  # bf16 MXU, f32 accumulate
    n = jnp.sqrt(ssq.reshape(-1, 1).astype(jnp.float32) + eps)
    scale = jnp.abs(u.astype(jnp.float32)) / n
    g = ct.reshape(-1, w.shape[1]).astype(jnp.float32) * mult.reshape(1, -1).astype(
        jnp.float32
    )
    if relu:
        g = jnp.where(out.reshape(-1, w.shape[1]) > 0, g, 0.0)
    g = (g * scale).astype(x2.dtype)
    dx2 = jnp.dot(g, w.T)
    # explanation mode: only the input carries gradient (params are frozen
    # at inference; the dynamic scale is detached per bcosconv2d.py:181-193)
    return (
        dx2.reshape(x4.shape),
        jnp.zeros_like(w),
        jnp.zeros_like(ssq),
        jnp.zeros_like(mult),
        jnp.zeros_like(add),
    )


_fused_tpu.defvjp(_fused_tpu_fwd, _fused_tpu_bwd)


def bcos_conv1x1_bn_act(
    x4: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array],
    mult: jax.Array,
    add: Optional[jax.Array],
    *,
    relu: bool = True,
    eps: float = CONV_NORM_EPS,
    explain: bool = False,
    train: bool = False,
    x_sumsq: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused b=2 B-cos 1x1 conv + per-channel affine + optional ReLU.

    x4 NHWC; w [Cin, Cout]; mult/add per-channel (BN eval affine: weight/std
    and folded bias). The Pallas path requires explain=True (its custom VJP
    implements the detached dynamic-linear cotangent), bias=None (bcosified
    models null conv biases) and MXU-friendly shapes; everything else takes
    the jnp path with identical semantics.
    """
    c_in, c_out = w.shape
    w = w.astype(x4.dtype)  # params are f32; compute in the activation dtype
    if add is None:
        add = jnp.zeros((c_out,), jnp.float32)
    from bcosification_tpu.ops import guided

    m = x4.shape[0] * x4.shape[1] * x4.shape[2]
    if (
        fused_enabled()
        # the Pallas custom VJP hard-codes the plain ReLU mask — defer to
        # the guided-backprop / DeepLIFT custom ReLU VJPs when those trace
        and not guided.guided_mode()
        and not guided.deeplift_mode()
        and explain
        and bias is None
        and x_sumsq is not None
        and m % 128 == 0
        and c_in % 128 == 0
        and c_out % 128 == 0
        and mult.size == c_out  # per-channel affine only (AllNorm's scalar
        # stat_shape would break the (1, c_out) BlockSpec; jnp broadcasts fine)
    ):
        # ssq is a constant w.r.t. differentiation in explanation mode (the
        # patch norm is detached); stop it here so no cotangent flows down
        # the hint chain (avoids a spurious f32 cotangent branch to the
        # producing activation).
        return _fused_tpu(x4, w, lax.stop_gradient(x_sumsq), mult, add, relu, eps)
    return _jnp_path(x4, w, bias, mult, add, relu, eps, explain, x_sumsq,
                     train=train)

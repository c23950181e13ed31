"""Fused B-cos matmul Pallas kernel (TPU).

The B-cos hot pattern for linears and 1x1 convs is
    u = x @ w;  n = ||x||_row;  y = (|u| / n) * u          (b = 2)
i.e. one matmul plus a row-norm plus an elementwise rescale. The reference
implements this as two passes over x (conv + avg_pool(x^2), bcosconv2d.py:153-
231); XLA fuses the elementwise tail but still materialises u and reads x
twice. This kernel computes the row sum-of-squares from the SAME x tiles that
feed the MXU and applies the dynamic scaling in the matmul epilogue — one pass
over x, no intermediate u in HBM.

Forward = Pallas; backward = standard matmuls (XLA), via custom_vjp with the
reference's stop-gradient placement:
- explain=True: dx = (g * s) @ w^T with s = |u|/n treated constant (the
  dynamic-linear W(x)); dw accumulates through u only.
- normal: dy/du = 2|u|/n and the -|u|u/n^2 row term through n.

Weight normalisation (BcosConv2d's unit-norm weights) stays outside in jnp —
the kernel contract takes the *effective* weights.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False

__all__ = ["bcos_matmul", "HAS_PALLAS"]


def _cdiv(a, b):
    return -(-a // b)


def _fwd_kernel(x_ref, w_ref, ssq_ref, y_ref, *, eps: float, eps_outside: bool, nsteps_k: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        y_ref[...] = jnp.zeros_like(y_ref)

    y_ref[...] += jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)

    @pl.when(k_idx == nsteps_k - 1)
    def _finalize():
        u = y_ref[...]
        ssq = ssq_ref[...]  # [TM, 1] row sum of squares (fp32)
        if eps_outside:
            n = jnp.sqrt(ssq) + eps
        else:
            n = jnp.sqrt(ssq + eps)
        y_ref[...] = u * (jnp.abs(u) / n)


def _pallas_forward(x, w, *, eps: float, eps_outside: bool, tm: int, tn: int, tk: int):
    m, k = x.shape
    k2, n = w.shape
    assert k == k2
    grid = (_cdiv(m, tm), _cdiv(n, tn), _cdiv(k, tk))
    nsteps_k = grid[2]
    # row sum-of-squares in fp32, computed once (vectorised, bandwidth-trivial
    # next to the matmul) and streamed per row-tile
    ssq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True)

    kernel = functools.partial(
        _fwd_kernel, eps=eps, eps_outside=eps_outside, nsteps_k=nsteps_k
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((tm, 1), lambda i, j, kk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, w, ssq)


def _reference_forward(x, w, eps, eps_outside):
    u = jnp.dot(x, w.astype(x.dtype))
    ssq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    n = (jnp.sqrt(ssq) + eps) if eps_outside else jnp.sqrt(ssq + eps)
    return u * (jnp.abs(u) / n.astype(u.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bcos_matmul(x, w, eps: float = 1e-6, eps_outside: bool = False, explain: bool = False):
    """y = (|x@w| / n(x)) * (x@w), the b=2 B-cos transform.

    eps_outside=False: n = sqrt(ssq + eps) (conv patch-norm semantics,
    bcosconv2d.py:212-221); True: n = sqrt(ssq) + eps (linear semantics,
    bcoslinear.py:113). x [M,K], w [K,N] -> y [M,N] (fp32).
    """
    if not HAS_PALLAS or jax.default_backend() != "tpu":
        return _reference_forward(x, w, eps, eps_outside).astype(jnp.float32)
    m, k = x.shape
    n = w.shape[1]
    tm = min(256, m) if m % 256 == 0 or m < 256 else 128
    tn = min(256, n)
    tk = min(512, k)
    if m % 8 or n % 128 or k % 128 or tn % 128 or tk % 128:
        return _reference_forward(x, w, eps, eps_outside).astype(jnp.float32)
    return _pallas_forward(x, w, eps=eps, eps_outside=eps_outside, tm=tm, tn=tn, tk=tk)


def _fwd(x, w, eps, eps_outside, explain):
    y = bcos_matmul(x, w, eps, eps_outside, explain)
    return y, (x, w)


def _bwd(eps, eps_outside, explain, res, g):
    x, w = res
    xf = x.astype(jnp.float32)
    u = jnp.dot(xf, w.astype(jnp.float32))
    ssq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
    n = (jnp.sqrt(ssq) + eps) if eps_outside else jnp.sqrt(ssq + eps)
    g = g.astype(jnp.float32)
    if explain:
        s = jnp.abs(u) / n  # detached dynamic scale
        gu = g * s
        dx = gu @ w.astype(jnp.float32).T
        dw = xf.T @ gu
    else:
        gu = g * (2.0 * jnp.abs(u) / n)
        dx = gu @ w.astype(jnp.float32).T
        # d n term: n depends on x only
        gn = jnp.sum(g * (-jnp.abs(u) * u / jnp.square(n)), axis=-1, keepdims=True)
        if eps_outside:
            dn_dx = xf / jnp.clip(jnp.sqrt(ssq), 1e-20, None)
        else:
            dn_dx = xf / jnp.sqrt(ssq + eps)
        dx = dx + gn * dn_dx
        dw = xf.T @ gu
    return dx.astype(x.dtype), dw.astype(w.dtype)


bcos_matmul.defvjp(_fwd, _bwd)

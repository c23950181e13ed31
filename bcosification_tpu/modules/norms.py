"""Detachable norm zoo (channel-last / NHWC), flax.linen.

Re-designs the reference norm zoo for JAX:
- centered detachable norms: `/root/reference/bcos/modules/norms/centered_norms.py`
- uncentered norms: `/root/reference/bcos/modules/norms/uncentered_norms/*.py`
- NoBias/Unaffine factory wrappers: `/root/reference/bcos/modules/norms/utils.py:22-88`

"Explanation mode" (the reference's `detach` flag on `DetachableModule`) is the
static ``explain`` call argument: it places `stop_gradient` on the variance so
the normalisation becomes an affine (dynamic-linear) map of the input —
centered norms subtract the (linear-in-x) mean but detach the std; uncentered
norms only divide by the (detached) std.

Running statistics live in the linen ``batch_stats`` collection and are updated
when ``train=True`` (the torch modules' ``self.training``); cross-device
averaging of batch statistics is left to the data-parallel train step (the
variance is computed on the per-device batch shard, like DDP's local BN).

Uncentered BatchNorm's `from_standard_module` bias-fold — the key trick that
preserves pretrained accuracy (batchnorm_uncentered.py:131-136) — lives in
`bcosification_tpu.bcosify.params` as a pure parameter transform.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "BatchNormUncentered2d",
    "AllNormUncentered2d",
    "GroupNormUncentered2d",
    "GNInstanceNormUncentered2d",
    "GNLayerNormUncentered2d",
    "PositionNormUncentered2d",
    "BatchNorm2d",
    "AllNorm2d",
    "DetachableGroupNorm2d",
    "DetachableGNInstanceNorm2d",
    "DetachableGNLayerNorm2d",
    "DetachableLayerNorm",
    "PlainLayerNorm",
    "DetachablePositionNorm2d",
    "NoBias",
    "Unaffine",
]


def _maybe_stop(v, explain: bool):
    return jax.lax.stop_gradient(v) if explain else v


def _affine(x, weight, bias):
    if weight is not None:
        x = x * weight
    if bias is not None:
        x = x + bias
    return x


class _RunningVarNorm(nn.Module):
    """Shared machinery for uncentered batch-stat norms (BN / AllNorm).

    Subclasses define the reduction axes for the variance. Uncentered = divide
    by sqrt(var + eps) only, never subtract the mean
    (batchnorm_uncentered.py:21-60, allnorm_uncentered.py:19-55).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    use_weight: bool = True
    use_bias: bool = True
    track_running_stats: bool = True
    dtype: Any = None

    def _stat_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def _reduce_axes(self, ndim: int) -> Tuple[int, ...]:
        raise NotImplementedError

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        return_affine: bool = False,
    ):
        """``return_affine=True`` (eval only): instead of normalising ``x``,
        return the equivalent per-channel ``(mult, add)`` = (weight/std,
        bias) so a caller can fold this norm into a fused conv epilogue
        (ops/pallas/bcos_conv1x1.py) — parameters/variables are declared
        identically, so checkpoints are unaffected. ``x`` is ignored and may
        be None."""
        assert return_affine or x.ndim == 4, f"expected NHWC input, got {x}"
        stat_shape = self._stat_shape()
        if return_affine:
            assert not train, "return_affine is an eval-only fusion hook"
            rv = self.variable(
                "batch_stats", "running_var",
                lambda: jnp.ones(stat_shape, jnp.float32),
            )
            self.variable(
                "batch_stats", "num_batches_tracked",
                lambda: jnp.zeros((), jnp.int32),
            )
            std = jnp.sqrt(rv.value + self.eps)
            mult = 1.0 / std
            add = None
            if self.affine and self.use_weight:
                mult = mult * self.param(
                    "weight", nn.initializers.ones, stat_shape, jnp.float32
                )
            if self.affine and self.use_bias:
                add = self.param(
                    "bias", nn.initializers.zeros, stat_shape, jnp.float32
                )
            return jnp.reshape(mult, (-1,)), (
                None if add is None else jnp.reshape(add, (-1,))
            )
        running_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones(stat_shape, jnp.float32)
        )
        # kept for torch-checkpoint parity; unused for fixed momentum
        num_batches = self.variable(
            "batch_stats", "num_batches_tracked", lambda: jnp.zeros((), jnp.int32)
        )

        if train:
            xs = _maybe_stop(x, explain).astype(jnp.float32)
            # one-pass biased variance E[x^2] - E[x]^2: jnp.var lowers to TWO
            # reduction passes over the activation (mean, then squared
            # deviation); a (sum, sumsq) pair fuses into ONE variadic reduce =
            # one HBM read. Convs don't fuse with elementwise on this
            # toolchain (docs/PERF.md), so every train-mode stat pass is pure
            # HBM time — measured ~18.2 -> ~16 ms RN50 train-mode forward.
            # f32 accumulators keep the cancellation error ~1e-7 relative for
            # activation-scale inputs (parity tests unchanged).
            axes = self._reduce_axes(x.ndim)
            import os

            if os.getenv("BCOS_TWOPASS_VAR", "0") == "1":  # rollback/AB gate
                var = jnp.var(xs, axis=axes)
            else:
                n_elems = 1
                for a in axes:
                    n_elems *= x.shape[a]
                s1 = jnp.sum(xs, axis=axes)
                s2 = jnp.sum(jnp.square(xs), axis=axes)
                mean = s1 / n_elems
                var = jnp.maximum(s2 / n_elems - jnp.square(mean), 0.0)
            if self.track_running_stats and not self.is_initializing():
                running_var.value = (
                    1 - self.momentum
                ) * running_var.value + self.momentum * jax.lax.stop_gradient(var)
                num_batches.value = num_batches.value + 1
        else:
            var = running_var.value

        std = jnp.sqrt(var + self.eps)
        if train and explain:
            std = jax.lax.stop_gradient(std)
        result = x / std.astype(x.dtype)

        weight = bias = None
        if self.affine and self.use_weight:
            weight = self.param("weight", nn.initializers.ones, stat_shape, jnp.float32)
        if self.affine and self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, stat_shape, jnp.float32)
        return _affine(result, weight, bias).astype(x.dtype)


class BatchNormUncentered2d(_RunningVarNorm):
    """BN without mean subtraction (batchnorm_uncentered.py:63-115).

    Per-channel variance over (N, H, W); NHWC so stats broadcast on the last
    axis directly.
    """

    def _stat_shape(self):
        return (self.features,)

    def _reduce_axes(self, ndim):
        return (0, 1, 2)


class AllNormUncentered2d(_RunningVarNorm):
    """AllNorm without mean subtraction — one scalar variance over the whole
    tensor (allnorm_uncentered.py:58-124)."""

    def _stat_shape(self):
        return (1,)

    def _reduce_axes(self, ndim):
        return tuple(range(ndim))


class GroupNormUncentered2d(nn.Module):
    """Uncentered group norm (groupnorm_uncentered.py:22-85): per-(sample,
    group) variance over the group's channels and all spatial positions."""

    features: int
    num_groups: int = 32
    eps: float = 1e-5
    affine: bool = True
    use_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        assert x.ndim == 4 and x.shape[-1] % self.num_groups == 0
        n, h, w, c = x.shape
        g = self.num_groups
        xg = x.reshape(n, h, w, g, c // g)
        var = jnp.var(
            _maybe_stop(xg, explain).astype(jnp.float32), axis=(1, 2, 4), keepdims=True
        )  # [n,1,1,g,1]
        std = jnp.sqrt(var + self.eps).astype(x.dtype)
        xg = xg / std
        x = xg.reshape(n, h, w, c)
        weight = bias = None
        if self.affine and self.use_weight:
            weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        if self.affine and self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return _affine(x, weight, bias).astype(x.dtype)


def GNInstanceNormUncentered2d(features: int, **kwargs):
    return GroupNormUncentered2d(features=features, num_groups=features, **kwargs)


def GNLayerNormUncentered2d(features: int, **kwargs):
    return GroupNormUncentered2d(features=features, num_groups=1, **kwargs)


class PositionNormUncentered2d(nn.Module):
    """Uncentered position norm (posnorm_uncentered.py:17-71): per-position
    variance over channels."""

    features: int
    eps: float = 1e-5
    affine: bool = True
    use_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        assert x.ndim == 4
        var = jnp.var(
            _maybe_stop(x, explain).astype(jnp.float32), axis=-1, keepdims=True
        )
        std = jnp.sqrt(var + self.eps).astype(x.dtype)
        x = x / std
        weight = bias = None
        if self.affine and self.use_weight:
            weight = self.param(
                "weight", nn.initializers.ones, (self.features,), jnp.float32
            )
        if self.affine and self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return _affine(x, weight, bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# Centered detachable norms (centered_norms.py)
# ---------------------------------------------------------------------------


class _RunningMeanVarNorm(nn.Module):
    """Centered batch-stat norm base (plain BN semantics). Explanation mode is
    only valid in eval (centered_norms.py:64-77): the running stats are
    constants, so eval BN is already an affine map."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    use_weight: bool = True
    use_bias: bool = True
    track_running_stats: bool = True

    def _stat_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def _reduce_axes(self, ndim: int) -> Tuple[int, ...]:
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        assert x.ndim == 4
        if explain and train:
            raise ValueError(
                "Centered batch norms only support explanation mode in eval!"
            )
        stat_shape = self._stat_shape()
        running_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros(stat_shape, jnp.float32)
        )
        running_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones(stat_shape, jnp.float32)
        )
        num_batches = self.variable(
            "batch_stats", "num_batches_tracked", lambda: jnp.zeros((), jnp.int32)
        )
        if train:
            xf = x.astype(jnp.float32)
            axes = self._reduce_axes(x.ndim)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if self.track_running_stats and not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * n / max(n - 1, 1)  # torch BN running update
                running_mean.value = (
                    1 - self.momentum
                ) * running_mean.value + self.momentum * jax.lax.stop_gradient(mean)
                running_var.value = (
                    1 - self.momentum
                ) * running_var.value + self.momentum * jax.lax.stop_gradient(unbiased)
                num_batches.value = num_batches.value + 1
        else:
            mean, var = running_mean.value, running_var.value

        std = jnp.sqrt(var + self.eps)
        result = (x - mean.astype(x.dtype)) / std.astype(x.dtype)
        weight = bias = None
        if self.affine and self.use_weight:
            weight = self.param("weight", nn.initializers.ones, stat_shape, jnp.float32)
        if self.affine and self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, stat_shape, jnp.float32)
        return _affine(result, weight, bias).astype(x.dtype)


class BatchNorm2d(_RunningMeanVarNorm):
    """Plain (centered) BN with the explanation-mode eval guard
    (centered_norms.py:72-77)."""

    def _stat_shape(self):
        return (self.features,)

    def _reduce_axes(self, ndim):
        return (0, 1, 2)


class AllNorm2d(_RunningMeanVarNorm):
    """Centered AllNorm — BN over the full tensor (centered_norms.py:34-68)."""

    def _stat_shape(self):
        return (1,)

    def _reduce_axes(self, ndim):
        return tuple(range(ndim))


class DetachableGroupNorm2d(nn.Module):
    """Centered GN; in explanation mode only the variance is detached, the mean
    (linear in x) stays attached (centered_norms.py:107-138)."""

    features: int
    num_groups: int = 32
    eps: float = 1e-5
    affine: bool = True
    use_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        assert x.ndim == 4 and x.shape[-1] % self.num_groups == 0
        n, h, w, c = x.shape
        g = self.num_groups
        xg = x.reshape(n, h, w, g, c // g).astype(jnp.float32)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
        var = _maybe_stop(var, explain)
        std = jnp.sqrt(var + self.eps)
        xg = (xg - mean) / std
        x_out = xg.reshape(n, h, w, c).astype(x.dtype)
        weight = bias = None
        if self.affine and self.use_weight:
            weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        if self.affine and self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return _affine(x_out, weight, bias).astype(x.dtype)


def DetachableGNInstanceNorm2d(features: int, **kwargs):
    return DetachableGroupNorm2d(features=features, num_groups=features, **kwargs)


def DetachableGNLayerNorm2d(features: int, **kwargs):
    return DetachableGroupNorm2d(features=features, num_groups=1, **kwargs)


class DetachableLayerNorm(nn.Module):
    """LayerNorm over the last axis with detachable variance — the transformer
    norm (centered_norms.py:187-224). ``detachable=False`` gives the plain
    nn.LayerNorm the reference's standard (non-B-cos) ViT configs use
    (vit_final/experiment_parameters.py:113): identical forward, but
    explanation mode places NO stop_gradient, so gradient-based attributions
    on standard baselines match the reference exactly."""

    features: int
    eps: float = 1e-5
    affine: bool = True
    use_weight: bool = True
    use_bias: bool = True
    detachable: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        var = _maybe_stop(var, explain and self.detachable)
        out = (xf - mean) / jnp.sqrt(var + self.eps)
        weight = bias = None
        if self.affine and self.use_weight:
            weight = self.param(
                "weight", nn.initializers.ones, (self.features,), jnp.float32
            )
        if self.affine and self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return _affine(out, weight, bias).astype(x.dtype)


def PlainLayerNorm(features: int, **kwargs):
    """The reference's plain nn.LayerNorm (standard non-B-cos ViT configs,
    vit_final/experiment_parameters.py:113): no explanation-mode detach."""
    return DetachableLayerNorm(features=features, detachable=False, **kwargs)


class DetachablePositionNorm2d(nn.Module):
    """Centered position norm: LN over the channel axis of an NHWC image with
    detachable variance (centered_norms.py:251-298)."""

    features: int
    eps: float = 1e-5
    affine: bool = True
    use_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        assert x.ndim == 4
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = _maybe_stop(jnp.var(xf, axis=-1, keepdims=True), explain)
        out = (xf - mean) / jnp.sqrt(var + self.eps)
        weight = bias = None
        if self.affine and self.use_weight:
            weight = self.param(
                "weight", nn.initializers.ones, (self.features,), jnp.float32
            )
        if self.affine and self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return _affine(out, weight, bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# Factory wrappers (norms/utils.py:22-88) — here they just preset flags.
# ---------------------------------------------------------------------------


def NoBias(make_layer):
    """Layer factory wrapper that disables the bias term."""
    new = functools.partial(make_layer, use_bias=False)
    functools.update_wrapper(new, make_layer, updated=())
    new.__name__ = getattr(make_layer, "__name__", "layer") + "NoBias"
    return new


def Unaffine(make_layer):
    """Layer factory wrapper that disables both weight and bias."""
    new = functools.partial(make_layer, use_bias=False, use_weight=False)
    functools.update_wrapper(new, make_layer, updated=())
    new.__name__ = getattr(make_layer, "__name__", "layer") + "Unaffine"
    return new

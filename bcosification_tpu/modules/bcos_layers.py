"""B-cos layers as flax.linen modules (NHWC / channel-last).

Wraps the functional core in `bcosification_tpu.ops.bcos`. Parity targets:
- `BcosConv2d` / `NormedConv2d` / `BcosConv2dWithScale`:
  `/root/reference/bcos/modules/bcosconv2d.py`
- `BcosLinear` / `NormedLinear`: `/root/reference/bcos/modules/bcoslinear.py`
- `BcosifyConv2d` / `BcosifyLinear` (conversion-time variants with *plain*
  pretrained weights and optional learnable b):
  `/root/reference/bcos/modules/bcosify{conv2d,linear}.py`
- `LogitLayer`: `/root/reference/bcos/modules/logitlayer.py:11-36`

Parameter naming: conv/linear kernels are called ``weight`` and stored HWIO /
(in, out) so torch checkpoints import with a pure transpose.

Explanation mode is the static ``explain`` call kwarg (≙ the reference's
`DetachableModule.detach` flag); learnable-b variants take the b value either
from their own parameter or from a call-time ``b_override`` (the TPU-native
replacement for the reference's gradient-hook interpolation schedule,
`/root/reference/bcos/training/hooks.py:7-23`).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.ops import bcos as ops

__all__ = [
    "NormedConv2d",
    "NormedLinear",
    "BcosConv2d",
    "BcosConv2dWithScale",
    "BcosLinear",
    "BcosifyConv2d",
    "BcosifyLinear",
    "LogitLayer",
]

IntOrPair = Union[int, Tuple[int, int]]


def _fan_in_uniform(fan_in: float):
    """torch nn.Conv2d/Linear default init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ConvBase(nn.Module):
    features: int
    kernel_size: IntOrPair = 1
    stride: IntOrPair = 1
    padding: IntOrPair = 0
    dilation: IntOrPair = 1
    groups: int = 1
    max_out: int = 1
    use_bias: bool = False
    param_dtype: Any = jnp.float32
    kernel_init: Optional[Callable] = None  # default: torch fan-in uniform

    def _kernel_shape(self, x) -> Tuple[int, int, int, int]:
        kh, kw = ops._pair(self.kernel_size)
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0, (in_ch, self.groups)
        return (kh, kw, in_ch // self.groups, self.features * self.max_out)

    def _weight(self, x):
        shape = self._kernel_shape(x)
        fan_in = shape[0] * shape[1] * shape[2]
        init = self.kernel_init or _fan_in_uniform(fan_in)
        return self.param("weight", init, shape, self.param_dtype)

    def _bias(self, x):
        if not self.use_bias:
            return None
        fan_in = math.prod(self._kernel_shape(x)[:3])
        return self.param(
            "bias",
            _fan_in_uniform(fan_in),
            (self.features * self.max_out,),
            self.param_dtype,
        )


class NormedConv2d(_ConvBase):
    """Conv2d with unit-norm weights per output channel (bcosconv2d.py:17-41).

    ``learned_scale`` corresponds to `set_scale` — a per-output-channel scale
    capturing pretrained weight norms; ``use_weight_norm`` toggles
    normalisation entirely.
    """

    use_weight_norm: bool = True
    learned_scale: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        w = self._weight(x)
        scale = None
        if self.learned_scale:
            scale = self.param(
                "scale",
                nn.initializers.ones,
                (self.features * self.max_out,),
                self.param_dtype,
            )
        return ops.normed_conv2d(
            x,
            w,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            scale=scale if self.use_weight_norm else None,
            bias=self._bias(x),
            use_weight_norm=self.use_weight_norm,
            # int8 serving is inference-only: the quantizer has zero gradient
            # (ops.bcos._int8_serving_enabled), so training forwards must not
            # take it either
            allow_int8=not explain and not train,
        )


class NormedLinear(nn.Module):
    """Linear with unit-norm weight rows (bcoslinear.py:20-27)."""

    features: int
    use_bias: bool = True
    use_weight_norm: bool = True
    learned_scale: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            _fan_in_uniform(in_features),
            (in_features, self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", _fan_in_uniform(in_features), (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )
        scale = None
        if self.learned_scale:
            scale = self.param(
                "scale", nn.initializers.ones, (self.features,), self.param_dtype
            )
        return ops.normed_linear(
            x,
            w,
            bias=bias,
            scale=scale if self.use_weight_norm else None,
            use_weight_norm=self.use_weight_norm,
        )




def _fused_1x1_ok(mod, b) -> bool:
    """Shape/config gate for the fused 1x1 conv+BN+act path."""
    kh, kw = ops._pair(mod.kernel_size)
    return (
        isinstance(b, (int, float)) and b == 2
        and (kh, kw) == (1, 1)
        and ops._pair(mod.stride) == (1, 1)
        and ops._pair(mod.padding) == (0, 0)
        and ops._pair(mod.dilation) == (1, 1)
        and mod.groups == 1
        and mod.max_out == 1
    )


def _epilogue_result(mod, x, w_hwio, bias, b, explain, x_sumsq, epilogue,
                     train=False):
    """Run the conv with a folded norm/act epilogue.

    ``epilogue=(mult, add, relu[, residual])`` comes from a norm module's
    ``return_affine=True`` hook; ``residual`` is an optional skip-branch
    tensor added before the (then post-add) ReLU — the torchvision block
    tail. Fusable 1x1 shapes go through ops.pallas.bcos_conv1x1 (Pallas on
    TPU under BCOS_FUSED=1, jnp otherwise); in explanation mode the
    elementwise tail goes through ops.b2_explain_segment (residual-free
    backward, convs left in XLA land — see explain_segment_enabled);
    anything else computes the plain B-cos conv and applies the affine /
    residual / ReLU explicitly — identical semantics every way.
    """
    from bcosification_tpu.ops import guided
    from bcosification_tpu.ops.pallas.bcos_conv1x1 import fusion_requested

    mult, add, relu, *rest = epilogue
    residual = rest[0] if rest else None
    if (
        explain
        and not fusion_requested()  # explicit BCOS_FUSED=1 keeps Pallas priority
        and isinstance(b, (int, float))
        and b == 2
        and mod.max_out == 1
        and ops.explain_segment_enabled()
        # the segment VJP hard-codes the plain ReLU mask — defer to the
        # guided-backprop / DeepLIFT custom ReLU VJPs when those trace
        and not (relu and (guided.guided_mode() or guided.deeplift_mode()))
    ):
        u = ops._conv(
            x, w_hwio.astype(x.dtype), mod.stride, mod.padding, mod.dilation,
            mod.groups,
        )
        if bias is not None:
            u = u + jnp.reshape(bias, (1, 1, 1, -1)).astype(u.dtype)
        n = ops.patch_norms(
            x, w_hwio.shape[:2], stride=mod.stride, padding=mod.padding,
            dilation=mod.dilation, groups=mod.groups,
            out_channels=w_hwio.shape[-1],
            x_sumsq=x_sumsq if mod.groups == 1 else None,
        ).astype(u.dtype)
        return ops.b2_explain_segment(u, n, mult, add, residual, relu)
    # The remaining branches fold (mult, add) and an in-segment ReLU only;
    # with a residual branch the ReLU is post-add, so it is applied after.
    inner_relu = relu if residual is None else False
    out = _epilogue_no_residual(
        mod, x, w_hwio, bias, b, explain, x_sumsq, (mult, add, inner_relu),
        train=train,
    )
    if residual is not None:
        out = out + residual
        if relu:
            out = guided.relu(out)
    return out


def _epilogue_no_residual(mod, x, w_hwio, bias, b, explain, x_sumsq, epilogue,
                          train=False):
    from bcosification_tpu.ops.pallas.bcos_conv1x1 import (
        bcos_conv1x1_bn_act,
        fusion_requested,
    )

    mult, add, relu = epilogue
    from bcosification_tpu.ops import guided as _guided

    if (
        explain
        and not fusion_requested()  # explicit BCOS_FUSED=1 keeps Pallas priority
        and isinstance(b, (int, float))
        and b == 2
        and mod.max_out == 1
        and ops.explain_layer_enabled()
        # b2_explain_layer's bwd hard-codes the plain ReLU mask too
        and not (
            relu and (_guided.guided_mode() or _guided.deeplift_mode())
        )
    ):
        # whole-layer custom VJP: no activation-sized scale residual (see
        # ops.bcos.b2_explain_layer / explain_layer_enabled for the numbers)
        return ops.b2_explain_layer(
            x,
            w_hwio,
            bias,
            mult,
            add,
            x_sumsq if mod.groups == 1 else None,
            ops._pair(mod.stride),
            ops._pair(mod.padding),
            ops._pair(mod.dilation),
            mod.groups,
            relu,
        )
    if _fused_1x1_ok(mod, b):
        w2 = w_hwio.reshape(w_hwio.shape[2], w_hwio.shape[3])
        return bcos_conv1x1_bn_act(
            x, w2, bias, mult, add, relu=relu, explain=explain, train=train,
            x_sumsq=x_sumsq if mod.groups == 1 else None,
        )
    out = ops.bcos_conv2d(
        x, w_hwio, b=b, stride=mod.stride, padding=mod.padding,
        dilation=mod.dilation, groups=mod.groups, max_out=mod.max_out,
        normalize_weights=False, bias=bias, explain=explain,
        x_sumsq=x_sumsq if mod.groups == 1 else None,
    )
    out = out * jnp.reshape(mult, (1, 1, 1, -1)).astype(out.dtype)
    if add is not None:
        out = out + jnp.reshape(add, (1, 1, 1, -1)).astype(out.dtype)
    if relu:
        from bcosification_tpu.ops import guided

        out = guided.relu(out)
    return out


class BcosConv2d(_ConvBase):
    """The B-cos conv (bcosconv2d.py:43-262): unit-norm weights, output scaled
    by |cos(x, w_hat)|^(b-1)."""

    b: float = 2.0
    normalize_weights: bool = True  # False in the Bcosify subclass

    def _effective_b(self, b_override):
        return self.b if b_override is None else b_override

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        b_override: Optional[jax.Array] = None,
        x_sumsq: Optional[jax.Array] = None,
        epilogue=None,
    ):
        b = self._effective_b(b_override)
        if epilogue is not None:
            w = self._weight(x)
            if self.normalize_weights:
                w = ops.normed_conv_weight(w)
            return _epilogue_result(
                self, x, w, self._bias(x), b, explain, x_sumsq, epilogue,
                train=train,
            )
        return ops.bcos_conv2d(
            x,
            self._weight(x),
            b=b,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            max_out=self.max_out,
            normalize_weights=self.normalize_weights,
            bias=self._bias(x),
            explain=explain,
            x_sumsq=x_sumsq if self.groups == 1 else None,
            allow_int8=not explain and not train,
        )


class BcosConv2dWithScale(BcosConv2d):
    """Deprecated v1 variant with a static output scale
    sqrt(ks^2 * C_in)/scale_factor (bcosconv2d.py:265-326)."""

    scale: Optional[float] = None
    scale_factor: float = 100.0

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        b_override: Optional[jax.Array] = None,
    ):
        out = ops.bcos_conv2d(
            x,
            self._weight(x),
            b=self._effective_b(b_override),
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            max_out=self.max_out,
            normalize_weights=self.normalize_weights,
            bias=self._bias(x),
            explain=explain,
            allow_int8=not explain and not train,
        )
        if self.scale is not None:
            scale = self.scale
        else:
            kh, kw = ops._pair(self.kernel_size)
            scale = math.sqrt(kh * kw * x.shape[-1]) / self.scale_factor
        return out / scale


class BcosLinear(nn.Module):
    """The B-cos linear transform (bcoslinear.py:30-130)."""

    features: int
    b: float = 2.0
    max_out: int = 1
    use_bias: bool = False
    normalize_weights: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        b_override: Optional[jax.Array] = None,
    ):
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            _fan_in_uniform(in_features),
            (in_features, self.features * self.max_out),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias",
                _fan_in_uniform(in_features),
                (self.features * self.max_out,),
                self.param_dtype,
            )
            if self.use_bias
            else None
        )
        return ops.bcos_linear(
            x,
            w,
            b=self.b if b_override is None else b_override,
            max_out=self.max_out,
            normalize_weights=self.normalize_weights,
            bias=bias,
            explain=explain,
        )


def _resolve_b(mod: nn.Module, b_override):
    """Learnable-b machinery for the Bcosify layers.

    The reference implements three variants (bcosifyconv2d.py:59-65 and the
    gradient hook at training/hooks.py:7-23):
    - fixed b (``learn_b=False, clamping=False``)
    - ``clamping``: b is a learnable parameter clamped to >= 1+1e-6
    - ``b_loss`` (``learn_b=True``): effective b = b_param + 2 with weight decay
      pulling b_param to 0 (i.e. b to 2)
    - scheduled interpolation b: 1 -> 2 — in the reference a forced-gradient
      hook on the b parameter; here simply pass ``b_override`` from an explicit
      schedule in the train step.
    """
    if b_override is not None:
        return b_override
    if mod.b_loss:
        b0 = mod.param("b", nn.initializers.zeros, (), jnp.float32)
        return b0 + 2.0
    if mod.clamping or mod.learnable_b:
        b0 = mod.param("b", nn.initializers.constant(float(mod.b)), (), jnp.float32)
        return jnp.clip(b0, 1.0 + 1e-6, None) if mod.clamping else b0
    return mod.b


class BcosifyConv2d(_ConvBase):
    """Conversion-time B-cos conv: inner conv keeps the *raw* pretrained
    weights (NOT unit-normalised) so pretrained behaviour is preserved at init
    (bcosifyconv2d.py:7-102)."""

    b: float = 2.0
    clamping: bool = False
    b_loss: bool = False
    learnable_b: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        b_override: Optional[jax.Array] = None,
        x_sumsq: Optional[jax.Array] = None,
        epilogue=None,
    ):
        b = _resolve_b(self, b_override)
        if epilogue is not None:
            return _epilogue_result(
                self, x, self._weight(x), self._bias(x), b, explain, x_sumsq,
                epilogue, train=train,
            )
        return ops.bcos_conv2d(
            x,
            self._weight(x),
            b=b,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            max_out=self.max_out,
            normalize_weights=False,
            bias=self._bias(x),
            explain=explain,
            x_sumsq=x_sumsq if self.groups == 1 else None,
            allow_int8=not explain and not train,
        )


class BcosifyLinear(nn.Module):
    """Conversion-time B-cos linear with raw pretrained weights
    (bcosifylinear.py:17-95)."""

    features: int
    b: float = 2.0
    max_out: int = 1
    use_bias: bool = False
    clamping: bool = False
    b_loss: bool = False
    learnable_b: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        b_override: Optional[jax.Array] = None,
        weight_only: bool = False,
    ):
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            _fan_in_uniform(in_features),
            (in_features, self.features * self.max_out),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias",
                _fan_in_uniform(in_features),
                (self.features * self.max_out,),
                self.param_dtype,
            )
            if self.use_bias
            else None
        )
        if weight_only:
            # raw-weight application, no bias / no dynamic scale: the pooled
            # BcosAttentionPool2d uses c_proj.weight as a PLAIN out-projection
            # inside attention (ref bcosattnpool.py:40-59 passes it into
            # F.multi_head_attention_forward, bypassing the B-cos forward)
            return jnp.dot(
                x,
                w.astype(x.dtype),
                precision=(
                    jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
                ),
            )
        return ops.bcos_linear(
            x,
            w,
            b=_resolve_b(self, b_override),
            max_out=self.max_out,
            normalize_weights=False,
            bias=bias,
            explain=explain,
        )


class LogitLayer(nn.Module):
    """Static temperature/bias on logits (logitlayer.py:11-36). B-cos nets
    output BCE logits with bias -log(n_classes - 1)."""

    logit_temperature: Optional[float] = None
    logit_bias: Optional[float] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        if self.logit_temperature is not None:
            x = x / self.logit_temperature
        if self.logit_bias is not None:
            x = x + self.logit_bias
        return x

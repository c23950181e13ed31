"""Core B-cos transform ops — the hot math of the framework.

The B-cos transform (arXiv 2205.10268, used for B-cosification in arXiv 2411.00715) is

    out = |cos(x_patch, w_hat)|^(B-1) * (w_hat . x_patch)

where ``w_hat`` are (optionally) unit-norm weights and ``cos = (w_hat.x)/||x||``.
Behaviour mirrors the reference implementation's semantics
(`/root/reference/bcos/modules/bcosconv2d.py:153-250`,
`/root/reference/bcos/modules/bcoslinear.py:88-130`,
`/root/reference/bcos/modules/bcosifyconv2d.py:50-102`) but is written TPU-first:

- NHWC activations / HWIO conv weights (XLA TPU native layouts).
- One traced program: ``explain`` (the reference's ``detach`` flag) is a static
  argument that places ``jax.lax.stop_gradient`` on the dynamic-linear scaling,
  so the explanation-mode model is *exactly linear* in the input and
  ``W(x) = d out / d x`` is obtained with a single fused VJP.
- Patch norms via ``lax.reduce_window`` (stride / padding / dilation / groups all
  supported by one primitive) instead of the reference's two code paths
  (``avg_pool2d(divisor_override=1)`` fast path + ones-kernel-conv slow path).

All public functions are pure and jit-friendly; `b` may be a Python number
(static fast paths for b==1/b==2) or a traced array (learnable-b variants).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "normed_conv_weight",
    "normed_linear_weight",
    "patch_norms",
    "patch_norms_reference",
    "dynamic_scale",
    "bcos_conv2d",
    "bcos_conv2d_reference",
    "bcos_linear",
    "normed_conv2d",
    "normed_linear",
]

# Stabilising constants — exact values matter for parity with the reference:
# conv patch norms add 1e-6 *inside* the sqrt (bcosconv2d.py:220), linear adds
# 1e-12 *after* the norm (bcoslinear.py:113), the |cos| power path adds 1e-6 to
# |cos| (bcosconv2d.py:189).
CONV_NORM_EPS = 1e-6
LINEAR_NORM_EPS = 1e-12
COS_EPS = 1e-6

IntOrPair = Union[int, Tuple[int, int], Sequence[int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 2, f"expected pair, got {v}"
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _pad_pairs(padding: IntOrPair) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    ph, pw = _pair(padding)
    return ((ph, ph), (pw, pw))


def normed_conv_weight(w: jax.Array, scale: Optional[jax.Array] = None) -> jax.Array:
    """L2-normalise a HWIO conv weight per output channel (w / ||w||).

    Mirrors `NormedConv2d.forward` (bcosconv2d.py:26-35). ``scale`` optionally
    rescales the unit-norm weights with captured pretrained norms (set_scale,
    bcosconv2d.py:37-38); shape broadcastable to (out,), e.g. (out,) or scalar.
    """
    norms = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1, 2), keepdims=True))
    w = w / norms
    if scale is not None:
        w = w * jnp.reshape(scale, (1, 1, 1, -1))
    return w


def normed_linear_weight(w: jax.Array, scale: Optional[jax.Array] = None) -> jax.Array:
    """L2-normalise an (in, out) linear weight per output feature.

    Mirrors `NormedLinear.forward` (bcoslinear.py:25-27); note the reference
    stores (out, in) — we store (in, out) for x @ w on the MXU.
    """
    norms = jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
    w = w / norms
    if scale is not None:
        w = w * jnp.reshape(scale, (1, -1))
    return w


def _s2d_conv_s2(x, w, padding: Tuple[int, int]):
    """k x k stride-2 conv as space-to-depth + ONE dense stride-1 conv.

    The classic TPU ResNet stem reformulation: write input index j = 2m + p
    (p in {0,1} the phase); then y[q] = sum_k w[k] x[2q + k - pad] becomes a
    stride-1 conv over the phase-stacked input xs[m, (p, c)] = x[2m + p, c]
    with kernel taps at m - q = (k - pad - p) / 2 for each valid (k, p).
    Exact (same summands, reassociated). Why it matters here: the RN50 stem's
    7x7/s2 6-channel conv backward is an input-dilated conv (75% zero MXU
    work, 6 of 128 lanes — measured 1.9 ms vs ~0.15 ideal,
    scripts/perf_probe6.py); in s2d form the autodiff transpose is a dense
    stride-1 conv over 24 channels with NO dilation, and the forward reads
    the same bytes through a better-tiled layout. Ref hot loop:
    `/root/reference/bcos/modules/bcosconv2d.py:153-231` (the stem instance).

    Requires: stride 2 both dims, even input H/W, groups=1, dilation=1, and
    output size == H/2 (i.e. padding = (k-1)//2 for odd k).
    """
    kh, kw, cin, cout = w.shape
    n, h, wd, _ = x.shape
    xs = (
        x.reshape(n, h // 2, 2, wd // 2, 2, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, wd // 2, 4 * cin)
    )

    def taps(k_size, pad):
        per_phase = {}
        for p in (0, 1):
            per_phase[p] = [
                ((k - pad - p) // 2, k)
                for k in range(k_size)
                if (k - pad - p) % 2 == 0
            ]
        return per_phase
    ty, tx = taps(kh, padding[0]), taps(kw, padding[1])
    min_y = min(o for v in ty.values() for o, _ in v)
    max_y = max(o for v in ty.values() for o, _ in v)
    min_x = min(o for v in tx.values() for o, _ in v)
    max_x = max(o for v in tx.values() for o, _ in v)
    sy, sx = max_y - min_y + 1, max_x - min_x + 1

    w4 = jnp.zeros((sy, sx, 4 * cin, cout), w.dtype)
    for py in (0, 1):
        for px in (0, 1):
            c0 = (py * 2 + px) * cin
            for oy, ky in ty[py]:
                for ox, kx in tx[px]:
                    w4 = w4.at[oy - min_y, ox - min_x, c0 : c0 + cin].set(w[ky, kx])

    return lax.conv_general_dilated(
        xs,
        w4,
        window_strides=(1, 1),
        padding=((-min_y, sy - 1 + min_y), (-min_x, sx - 1 + min_x)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )


def _s2d_applicable(x, w, stride, padding, dilation, groups) -> bool:
    # MEASURED THROUGHPUT-NEUTRAL on v5e for the headline bench (RN50
    # fwd+explain bf16 batch 128, round 3, interleaved A/B: s2d off
    # 4065/4131/4757 img/s vs on 4057/4099/4576 — differences are inside the
    # axon tunnel's run-to-run spread, which is bimodal at ~4100/~4600).
    # The default fast pass already phase-decomposes the stem transpose
    # (_convT2x), so s2d only changes the forward conv there. Kept opt-in
    # (BCOS_S2D_STEM=1, exact — tests/test_s2d_stem.py) because it DOES fix
    # the 1.9 ms dilated stem dx for pure-autodiff consumers (perf_probe6).
    # See docs/PERF.md round-3.
    import os

    if os.getenv("BCOS_S2D_STEM", "0") != "1":
        return False
    kh, kw = w.shape[0], w.shape[1]
    return (
        _pair(stride) == (2, 2)
        and _pair(dilation) == (1, 1)
        and groups == 1
        and kh >= 3
        and kw >= 3
        and _pair(padding) == ((kh - 1) // 2, (kw - 1) // 2)
        and kh % 2 == 1
        and kw % 2 == 1
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
        # the big-spatial/small-channel regime where the dilated transpose
        # hurts; deep stride-2 convs (256+ channels) are already MXU-bound
        and x.shape[-1] <= 64
    )


def _int8_serving_enabled() -> bool:
    """Opt-in dynamic-int8 serving quantization (BCOS_INT8=1, default off).

    v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 MAC rate and int8
    operands halve the HBM bytes per conv. MEASURED round 5 (docs/PERF.md
    "int8 serving"): per-conv speedups of 1.66-2.02x on the deep RN50
    shapes but 0.82x on the spatially-large layer1
    (scripts/perf_probe17.py). END-TO-END the ALL-conv RN50 serving
    forward is 0.962-0.971x — a ~3% LOSS (scripts/perf_probe18.py,
    interleaved): the per-conv quantize/dequantize elementwise traffic
    outweighs the MXU gain on this bandwidth-bound net. SELECTIVE
    quantization (BCOS_INT8_MIN_CH=128, the default — stem/layer1 stay
    exact bf16) measures 1.017x (scripts/perf_probe19.py, interleaved,
    every rep above every bf16 rep), so opting in via BCOS_INT8=1 yields
    the best-measured configuration; the flag itself stays OFF by default
    (exact bf16 is the published serving semantics). SERVING-ONLY: the round() in the quantizer
    has zero gradient, so training or autodiff-based explanations under
    this flag would be silently wrong — module call sites only allow it on
    plain inference value forwards (`allow_int8=not explain and not
    train`), and the quantized conv's output carries
    ``_int8_no_grad_guard``, whose VJP raises if anything differentiates
    through it anyway. Accuracy is approximate (per-SAMPLE activation
    scale, per-output-channel weight scale; ~7% pre-logit feature rel-L2
    over the 54-conv RN50 at random init; tolerances locked in
    tests/test_int8_serving.py).
    """
    import os

    return os.getenv("BCOS_INT8", "0") == "1"


@jax.custom_vjp
def _int8_no_grad_guard(y):
    """Identity whose VJP raises: the int8 quantizer's round() has zero
    gradient, so any autodiff through the quantized conv (training, or an
    explanation path that slipped past the ``allow_int8`` gates) would be
    silently wrong. Fail loudly at backward-trace time instead."""
    return y


def _int8_guard_fwd(y):
    return y, None


def _int8_guard_bwd(_, ct):
    raise RuntimeError(
        "BCOS_INT8 quantized conv was differentiated. The dynamic-int8 "
        "serving path (BCOS_INT8=1) has zero gradients through its round() "
        "quantizer — training or autodiff-based explanations under this flag "
        "would be silently broken. Unset BCOS_INT8 for training runs; it is "
        "a serving-only flag (tests/test_int8_serving.py)."
    )


_int8_no_grad_guard.defvjp(_int8_guard_fwd, _int8_guard_bwd)


def _conv_int8_dynamic(x, w, stride, padding, dilation, groups):
    """Dynamically quantized int8 conv (NHWC/HWIO), bf16 in/out.

    Per-SAMPLE activation scale (max-abs over H,W,C per batch element, a
    reduction XLA fuses into x's producer) — per-sample rather than
    per-tensor so one high-magnitude image cannot degrade the quantization
    of its batchmates and a given image's served logits are independent of
    batch composition. Per-output-channel weight scale (loop-invariant:
    LICM hoists it out of serving loops, and jit-cached weights amortise
    it), int32 MXU accumulation, scale-folded dequant into the consumer
    fusion. Differentiating the result raises (``_int8_no_grad_guard``).
    """
    import os

    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    fixed = os.getenv("BCOS_INT8_SCALE")
    if fixed is not None:
        # static activation scale: lets the quantize fuse into x's PRODUCER
        # (no max-dependency), so with every consumer of x fused (quant +
        # channel_sumsq hint) the bf16 intermediate never reaches HBM.
        # One global constant is a measurement knob — real deployments
        # calibrate per layer.
        sx = jnp.full((x.shape[0], 1, 1, 1), float(fixed), jnp.float32)
    else:
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-12
        )
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=_pair(stride),
        padding=_pad_pairs(padding),
        rhs_dilation=_pair(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    out = (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
    return _int8_no_grad_guard(out)


def _conv(x, w, stride, padding, dilation, groups, allow_int8=False):
    # HIGHEST keeps fp32 convs exactly fp32 (XLA's default may strength-reduce).
    # bf16 inputs ride the MXU, which accumulates in fp32 regardless of the
    # stored output type (preferred_element_type's transpose rule mis-types the
    # VJP in this JAX version, so we rely on the MXU's native accumulation).
    import os

    if (
        allow_int8
        and _int8_serving_enabled()
        and x.dtype == jnp.bfloat16
        # BCOS_INT8_MIN_CH: skip quantizing convs whose PER-GROUP operand
        # channel count is below the threshold. probe17 measured int8
        # LOSING (0.82x) on the thin-contraction layer1 shapes while
        # winning 1.66-2.02x at >=128 channels; end-to-end the all-conv
        # config is 0.962-0.971x (probe18) while min_ch=128 is 1.017x
        # (probe19, docs/PERF.md "int8 serving") — so the best-measured
        # threshold is the default. Per-group depths (HWIO: w.shape[2] is
        # already C_in/groups) keep grouped/depthwise convs — whose MXU
        # contraction is the thin per-group slice, probe17's losing regime
        # — out of the quantized set even when total channels are wide.
        # 0 = quantize every eligible conv (probe18's config).
        and min(w.shape[2], w.shape[-1] // max(groups, 1))
        >= int(os.getenv("BCOS_INT8_MIN_CH", "128"))
    ):
        return _conv_int8_dynamic(x, w, stride, padding, dilation, groups)

    if (
        os.getenv("BCOS_1X1_DOT", "0") == "1"
        and w.shape[0] == 1 and w.shape[1] == 1 and groups == 1
        and _pair(stride) == (1, 1) and _pair(padding) == (0, 0)
    ):
        # 1x1/s1/p0 conv as a matmul over the channel axis: gives XLA's dot
        # path (different fusion/tiling decisions than the conv path)
        n, h, ww, c = x.shape
        y = jnp.dot(
            x.reshape(-1, c), w.reshape(c, -1),
            precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
        )
        return y.reshape(n, h, ww, -1)
    if _s2d_applicable(x, w, stride, padding, dilation, groups):
        return _s2d_conv_s2(x, w, (_pair(padding)[0], _pair(padding)[1]))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=_pair(stride),
        padding=_pad_pairs(padding),
        rhs_dilation=_pair(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )


def channel_sumsq(x: jax.Array) -> jax.Array:
    """Per-pixel channel sum-of-squares hint, [N,H,W,1] fp32.

    Computed right after an activation is produced so XLA can fold it into
    the producer's fusion (one extra tiny output); downstream B-cos convs
    build their patch norms from this hint instead of re-reading the full
    activation. Numerically identical to what ``patch_norms`` computes
    internally (square+sum in fp32). Measured throughput-neutral on
    v5e/JAX 0.9 for RN50 fwd+explain (XLA was already fusing the re-read);
    kept because it is exact, free, and makes the norm's data dependency
    explicit for other compilers/batch shapes."""
    return jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)


def patch_norms(
    x: jax.Array,
    kernel_size: IntOrPair,
    *,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    out_channels: Optional[int] = None,
    eps: float = CONV_NORM_EPS,
    x_sumsq: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-patch L2 norms ``||x_patch||`` of an NHWC input.

    Equivalent to `BcosConv2d.calc_patch_norms` (bcosconv2d.py:196-231) *and*
    its dilation-capable `_calc_patch_norms_slow` (bcosconv2d.py:233-250) in a
    single reduce_window formulation: sum x^2 over channels (per group), then a
    windowed sum with the conv's stride/padding/dilation, +eps, sqrt.

    ``x_sumsq``: optional precomputed ``channel_sumsq(x)`` hint (groups==1
    only) — avoids the second full read of ``x``.

    Returns [N, Ho, Wo, C_broadcast] where C_broadcast is 1 for groups==1 or
    ``out_channels`` (group norms repeated O//G times) for grouped convs.
    """
    n, h, w_, c = x.shape
    if x_sumsq is not None and groups == 1:
        squares = x_sumsq.astype(jnp.float32)
    elif groups == 1:
        squares = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    else:
        # channel-last: [N,H,W,C] -> [N,H,W,G,C//G] -> [N,H,W,G]
        squares = jnp.sum(
            jnp.square(x.astype(jnp.float32)).reshape(n, h, w_, groups, c // groups),
            axis=-1,
        )

    kh, kw = _pair(kernel_size)
    norms = lax.reduce_window(
        squares,
        init_value=0.0,  # python scalar: jnp constants break linearize-under-jit
        computation=lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, *_pair(stride), 1),
        padding=((0, 0), *_pad_pairs(padding), (0, 0)),
        window_dilation=(1, *_pair(dilation), 1),
    )
    norms = jnp.sqrt(norms + eps)

    if groups > 1:
        assert out_channels is not None, "out_channels required for grouped conv"
        # [N,Ho,Wo,G] -> [N,Ho,Wo,O]: group g covers output channels
        # [g*(O//G), (g+1)*(O//G)) — matches torch.repeat_interleave on dim=1.
        norms = jnp.repeat(norms, out_channels // groups, axis=-1)
    return norms


def patch_norms_reference(
    x: jax.Array,
    weight_shape: Tuple[int, int, int, int],
    *,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    eps: float = CONV_NORM_EPS,
) -> jax.Array:
    """Oracle: patch norms via an explicit ones-kernel convolution.

    The "definitely correct" slow path of the reference
    (`_calc_patch_norms_slow`, bcosconv2d.py:233-250), kept for testing.
    ``weight_shape`` is the HWIO shape of the conv weight.
    """
    ones = jnp.ones(weight_shape, x.dtype)
    s = _conv(jnp.square(x), ones, stride, padding, dilation, groups)
    return jnp.sqrt(s + eps)


def _use_pallas() -> bool:
    """Fused-kernel dispatch policy (BCOS_PALLAS=1 opt-in).

    Measured end-to-end on v5e (RN50 fwd+explain, bf16, batch 128): the Pallas
    path is ~3x SLOWER than XLA (1350 vs 4163 img/s) — its custom VJP
    recomputes u = x@w in the backward instead of reusing XLA's saved
    residuals, and the fp32 kernel output breaks cross-layer bf16 fusion. XLA
    already fuses the b=2 epilogue into the conv, so the fused kernel only
    wins in isolation, not in the whole program. Kept as an opt-in native
    kernel; the production path is XLA.
    """
    import os

    return os.getenv("BCOS_PALLAS", "0") == "1" and jax.default_backend() == "tpu"



def _maybe_stop(v: jax.Array, explain: bool) -> jax.Array:
    return lax.stop_gradient(v) if explain else v


@jax.custom_vjp
def _b2_explain_scale_mul(out: jax.Array, norm: jax.Array) -> jax.Array:
    """b=2 explanation-mode ``(|out|/norm) * out`` whose VJP recomputes the
    scale from the output: ``scale = sqrt(|y|/norm)`` (y = out*|out|/norm =>
    |y|/norm = (out/norm)^2). Saves only (y, norm) as residuals.

    NOTE: measured *slower* end-to-end than the plain formulation on RN50/v5e
    (3636 vs 4120 img/s) — the custom_vjp boundary forces the pre-norm-layer
    tensor y to materialise, defeating the conv-epilogue fusion that
    previously folded the following BN+ReLU into the same kernel. Kept for
    reference/tests; the production explain path uses `_b2_explain_conv`
    (whole-layer recompute) instead.
    """
    return (jnp.abs(out) / norm) * out


def _b2_explain_scale_mul_fwd(out, norm):
    y = (jnp.abs(out) / norm) * out
    return y, (y, norm)


def _b2_explain_scale_mul_bwd(res, ct):
    y, norm = res
    scale = jnp.sqrt(jnp.abs(y) / norm)
    return (ct * scale, jnp.zeros_like(norm))


_b2_explain_scale_mul.defvjp(_b2_explain_scale_mul_fwd, _b2_explain_scale_mul_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _b2_explain_conv(x, wn, bias, stride, padding, dilation, groups):
    """Whole-layer b=2 explanation-mode B-cos conv with a recompute VJP.

    Value: ``y = (|out|/norm) * out`` with ``out = conv(x, wn) [+ bias]`` and
    ``norm`` the patch norms — identical to the two-pass formulation with
    stop_gradients (bcosconv2d.py:153-231 detach semantics).

    VJP design: the naive autodiff saves the activation-sized dynamic-scale
    tensor per layer (one extra HBM write + read each; fwd+explain on v5e is
    HBM-bound at ~215 MB/img vs an 11 ms compute floor). Here the backward
    saves only (x, wn, bias) — x is the layer input and is materialised
    anyway — and *recomputes* out/norm/scale with a second conv on the MXU,
    then applies the transposed conv to ``ct * scale``.

    MEASURED (RN50 batch 128 bf16, v5e): throughput-neutral vs plain autodiff
    (4108 vs 4137 img/s, within run noise) — the custom_vjp boundary makes
    the pre-BN tensor materialise, spending what the dropped residual saved.
    It does cut peak memory (no scale residuals), so it's kept as an opt-in
    via BCOS_EXPLAIN_CONV=1 for memory-constrained batch sizes. The related
    experiments `_b2_explain_scale_mul` (slower: 3636) and
    save_only_these_names("bcos_act") remat (much slower: 2930) are recorded
    in scripts/perf_probe{2,3}.py.

    Gradients w.r.t. wn/bias are not needed in explanation mode (inference);
    they are returned as zeros.
    """
    out = _conv(x, wn, stride, padding, dilation, groups)
    if bias is not None:
        out = out + jnp.reshape(bias, (1, 1, 1, -1)).astype(out.dtype)
    norm = patch_norms(
        x, wn.shape[:2], stride=stride, padding=padding, dilation=dilation,
        groups=groups, out_channels=wn.shape[-1],
    ).astype(out.dtype)
    return (jnp.abs(out) / norm) * out


def _b2_explain_conv_fwd(x, wn, bias, stride, padding, dilation, groups):
    y = _b2_explain_conv(x, wn, bias, stride, padding, dilation, groups)
    return y, (x, wn, bias)


def _b2_explain_conv_bwd(stride, padding, dilation, groups, res, ct):
    x, wn, bias = res

    def conv_fn(xx):
        return _conv(xx, wn, stride, padding, dilation, groups)

    out, conv_vjp = jax.vjp(conv_fn, x)
    if bias is not None:
        out = out + jnp.reshape(bias, (1, 1, 1, -1)).astype(out.dtype)
    norm = patch_norms(
        x, wn.shape[:2], stride=stride, padding=padding, dilation=dilation,
        groups=groups, out_channels=wn.shape[-1],
    ).astype(out.dtype)
    scale = jnp.abs(out) / norm
    (ct_x,) = conv_vjp((ct * scale).astype(out.dtype))
    ct_bias = None if bias is None else jnp.zeros_like(bias)
    return ct_x, jnp.zeros_like(wn), ct_bias


_b2_explain_conv.defvjp(_b2_explain_conv_fwd, _b2_explain_conv_bwd)


def explain_layer_enabled() -> bool:
    """Whole-layer explain VJP dispatch (BCOS_EXPLAIN_LAYER=1, opt-in).

    Round-2 measurement (RN50 fwd+explain, bf16, batch 128, v5e): the default
    autodiff stores an activation-sized dynamic-scale residual per conv layer
    (the 205 MB two-output fusions in the HLO); stage-1 backward alone was
    11.1 ms for ~1.3 ms of conv compute — pure HBM traffic. The whole-layer
    custom VJP below removes that residual entirely by reconstructing the
    scale from the layer's OWN OUTPUT (stored anyway as the next layer's
    input): scale = |u|/n = sqrt(|z - add| / (|mult| n)), with the ReLU gate
    zeroing exactly the region where z is not invertible. Unlike the round-1
    attempts (scale-mul custom_vjp: 3636 img/s; save_only_these_names remat:
    2930), the custom_vjp boundary here coincides with the layer output, so
    no extra tensor materialises.
    """
    import os

    return os.getenv("BCOS_EXPLAIN_LAYER", "0") == "1"


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def b2_explain_layer(
    x, wn, bias, mult, add, x_sumsq, stride, padding, dilation, groups, relu
):
    """Fused b=2 B-cos conv + per-channel affine (folded eval BN) + optional
    ReLU in EXPLANATION mode, with a residual-free backward.

    Value (identical to the composed path, bcosconv2d.py:153-231 +
    batchnorm_uncentered.py eval affine):
        u = conv(x, wn) [+ bias];  n = patch norms of x
        y = (|u| / n) * u;  z = y * mult [+ add];  [z = relu(z)]

    VJP (explanation mode: |u|/n and n are detached, BN affine is constant):
        ct_u = ct * relu'(z) * mult * scale
        scale = |u|/n = sqrt(|z - add| / (|mult| * n))   (from the output!)
        dx    = conv^T(ct_u)
    Residuals: (z, n, wn, mult, add) — z is the layer output the next layer
    stores anyway and n is C-times smaller than an activation, so the
    per-layer activation-sized scale residual write+read disappears.
    """
    z, _ = _b2_layer_fwd_value(
        x, wn, bias, mult, add, x_sumsq, stride, padding, dilation, groups, relu
    )
    return z


def _b2_layer_fwd_value(
    x, wn, bias, mult, add, x_sumsq, stride, padding, dilation, groups, relu
):
    u = _conv(x, wn.astype(x.dtype), stride, padding, dilation, groups)
    if bias is not None:
        u = u + jnp.reshape(bias, (1, 1, 1, -1)).astype(u.dtype)
    n = patch_norms(
        x, wn.shape[:2], stride=stride, padding=padding, dilation=dilation,
        groups=groups, out_channels=wn.shape[-1], x_sumsq=x_sumsq,
    ).astype(u.dtype)
    y = (jnp.abs(u) / n) * u
    z = y * jnp.reshape(mult, (1, 1, 1, -1)).astype(y.dtype)
    if add is not None:
        z = z + jnp.reshape(add, (1, 1, 1, -1)).astype(z.dtype)
    if relu:
        z = jnp.maximum(z, 0)
    return z, n


def _b2_explain_layer_fwd(
    x, wn, bias, mult, add, x_sumsq, stride, padding, dilation, groups, relu
):
    z, n = _b2_layer_fwd_value(
        x, wn, bias, mult, add, x_sumsq, stride, padding, dilation, groups, relu
    )
    # x rides along for linear_transpose's aval only — never read in the bwd
    return z, (z, n, x, wn, bias, mult, add, x_sumsq)


def _b2_explain_layer_bwd(stride, padding, dilation, groups, relu, res, ct):
    z, n, x, wn, bias, mult, add, x_sumsq = res
    m = jnp.reshape(mult, (1, 1, 1, -1)).astype(z.dtype)
    zz = z if add is None else z - jnp.reshape(add, (1, 1, 1, -1)).astype(z.dtype)
    # scale recovered from the output: |y| = |zz|/|m| => |u|/n = sqrt(|y|/n)
    ct_u = ct * (jnp.sign(m) * jnp.sqrt(jnp.abs(m))) * jnp.sqrt(jnp.abs(zz) / n)
    if relu:
        ct_u = jnp.where(z > 0, ct_u, jnp.zeros_like(ct_u))

    def conv_fn(xx):
        return _conv(xx, wn.astype(x.dtype), stride, padding, dilation, groups)

    (dx,) = jax.linear_transpose(conv_fn, jax.ShapeDtypeStruct(x.shape, x.dtype))(
        ct_u.astype(z.dtype)
    )
    ct_bias = None if bias is None else jnp.zeros_like(bias)
    ct_add = None if add is None else jnp.zeros_like(add)
    ct_ssq = None if x_sumsq is None else jnp.zeros_like(x_sumsq)
    return dx, jnp.zeros_like(wn), ct_bias, jnp.zeros_like(mult), ct_add, ct_ssq


b2_explain_layer.defvjp(_b2_explain_layer_fwd, _b2_explain_layer_bwd)


def explain_segment_enabled() -> bool:
    """Elementwise-segment explain VJP dispatch (BCOS_EXPLAIN_SEGMENT).

    Round-2 design, learning from both earlier failures:
    - the scale-mul-only custom VJP (3636 img/s) covered too LITTLE — its
      output boundary materialised the pre-BN tensor, splitting the conv
      epilogue fusion in half;
    - the whole-layer custom VJP (3887 img/s) covered too MUCH — with the
      conv inside the opaque fwd/bwd pair, XLA lost cross-conv merges
      (79 -> 84 convs in the HLO).

    This one covers exactly the elementwise tail of a B-cos layer
    (dynamic scale -> folded eval-BN affine -> optional residual add ->
    optional ReLU), keeping every convolution in plain XLA land. Its only
    residuals are the segment OUTPUT (stored anyway: it is the next conv's
    input), the residual-branch input (stored anyway), and the patch norm
    (C-times smaller than an activation) — so the per-layer activation-sized
    dynamic-scale residual write+read disappears without adding any tensor
    that wasn't already materialised.
    """
    import os

    return os.getenv("BCOS_EXPLAIN_SEGMENT", "0") == "1"


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def b2_explain_segment(u, n, mult, add, identity, relu):
    """b=2 B-cos elementwise segment in EXPLANATION mode, residual-free VJP.

    Value (identical to the composed default path, bcosconv2d.py:153-231
    detach semantics + eval-BN affine + torchvision block tail):

        s = |u| / n            (u: raw conv output, n: patch norms)
        z = (s * u) * mult [+ add] [+ identity]
        out = relu(z) if relu else z

    VJP (explanation mode: s and n are detached, the affine is constant):

        mask = out > 0 if relu else 1
        zz   = out [- add] [- identity]          # == s*u*mult where mask
        ct_u = ct * mask * sign(mult) * sqrt(|mult|) * sqrt(|zz| / n)
               # == ct * mask * mult * s, since |zz| = |u|^2 |mult| / n
        ct_identity = ct * mask

    The scale is reconstructed from the segment's own output instead of being
    saved, exactly; where the ReLU clipped (out == 0) the reconstruction is
    invalid but the mask zeroes it. Catastrophic-cancellation caveat: with a
    residual branch, zz = out - identity loses relative precision where
    |s*u*mult| << |identity| — but there the true scale contribution is
    itself near zero, so the absolute error in ct_u stays at rounding level.

    Gradients w.r.t. n/mult/add are not needed in explanation mode; zeros.
    """
    out, _ = _b2_segment_value(u, n, mult, add, identity, relu)
    return out


def _b2_segment_value(u, n, mult, add, identity, relu):
    scale = jnp.abs(u) / n
    z = (scale * u) * jnp.reshape(mult, (1, 1, 1, -1)).astype(u.dtype)
    if add is not None:
        z = z + jnp.reshape(add, (1, 1, 1, -1)).astype(z.dtype)
    if identity is not None:
        z = z + identity
    if relu:
        z = jnp.maximum(z, 0)
    return z, n


def _b2_explain_segment_fwd(u, n, mult, add, identity, relu):
    out, n = _b2_segment_value(u, n, mult, add, identity, relu)
    return out, (out, n, mult, add, identity)


def _b2_explain_segment_bwd(relu, res, ct):
    out, n, mult, add, identity = res
    m = jnp.reshape(mult, (1, 1, 1, -1)).astype(out.dtype)
    zz = out
    if add is not None:
        zz = zz - jnp.reshape(add, (1, 1, 1, -1)).astype(out.dtype)
    if identity is not None:
        zz = zz - identity
    ct_eff = ct
    if relu:
        ct_eff = jnp.where(out > 0, ct, jnp.zeros_like(ct))
    ct_u = ct_eff * (jnp.sign(m) * jnp.sqrt(jnp.abs(m))) * jnp.sqrt(jnp.abs(zz) / n)
    ct_identity = None if identity is None else ct_eff
    ct_add = None if add is None else jnp.zeros_like(add)
    return ct_u, jnp.zeros_like(n), jnp.zeros_like(mult), ct_add, ct_identity


b2_explain_segment.defvjp(_b2_explain_segment_fwd, _b2_explain_segment_bwd)


def dynamic_scale(
    out: jax.Array,
    norm: jax.Array,
    b: Union[float, jax.Array],
    *,
    explain: bool = False,
) -> jax.Array:
    """The |cos|^(B-1) dynamic-linear scaling factor.

    Mirrors bcosconv2d.py:179-193: in explanation mode both the raw linear
    output and the patch norm are detached so the composed layer is linear in x.
    ``b`` static 2 takes the fast path |out|/norm; otherwise the stabilised
    (|out/norm| + 1e-6)^(b-1) power path (also used for traced/learnable b).
    """
    from jax.ad_checkpoint import checkpoint_name

    mdo = _maybe_stop(out, explain)
    norm = _maybe_stop(norm, explain)
    if isinstance(b, (int, float)) and b == 2:
        scale = jnp.abs(mdo) / norm
    else:
        abs_cos = jnp.abs(mdo / norm) + COS_EPS
        scale = jnp.power(abs_cos, jnp.asarray(b) - 1)
    # Named so the explain VJP can drop this activation-sized residual and
    # recompute it from (out, norm) — both materialised anyway — inside the
    # backward fusion (explain/core.py wraps the forward in jax.checkpoint
    # with save_anything_except_these_names). Identity outside jax.checkpoint.
    return checkpoint_name(scale, "bcos_scale")


def bcos_conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    b: Union[float, jax.Array] = 2.0,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    max_out: int = 1,
    normalize_weights: bool = True,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    explain: bool = False,
    x_sumsq: Optional[jax.Array] = None,
    allow_int8: Optional[bool] = None,
) -> jax.Array:
    """B-cos 2D convolution, NHWC/HWIO.

    ``normalize_weights=True`` is `BcosConv2d` (unit-norm weights,
    bcosconv2d.py:153-194); ``False`` is the conversion-time `BcosifyConv2d`
    (plain pretrained weights keep their norms, bcosifyconv2d.py:50-102), which
    may also carry a ``bias`` (applied to the raw linear output before the
    dynamic scaling, like nn.Conv2d's bias inside self.linear).

    ``b`` may be traced (learnable-b / clamping / b_loss variants — the caller
    maps those to an effective b, see modules.BcosifyConv2d).
    ``x_sumsq``: optional `channel_sumsq(x)` hint for the patch norms.
    ``allow_int8``: whether the BCOS_INT8 serving path may quantize this
    conv; defaults to ``not explain``; module call sites that know ``train``
    pass ``not explain and not train`` (the quantizer has zero gradient).
    """
    if max_out < 1:
        raise ValueError(f"max_out must be >= 1, got {max_out}")
    out_channels = w.shape[-1] // max_out

    wn = normed_conv_weight(w, scale) if normalize_weights else w

    # fused Pallas path: 1x1/s1/p0 conv with b=2 is a B-cos matmul
    if (
        _use_pallas()
        and isinstance(b, (int, float))
        and b == 2
        and max_out == 1
        and groups == 1
        and bias is None
        and w.shape[0] == 1
        and w.shape[1] == 1
        and _pair(stride) == (1, 1)
        and _pair(padding) == (0, 0)
    ):
        from bcosification_tpu.ops.pallas.bcos_matmul import bcos_matmul

        n_, h_, w2_, c_ = x.shape
        y = bcos_matmul(
            x.reshape(n_ * h_ * w2_, c_),
            wn.reshape(c_, -1).astype(x.dtype),
            CONV_NORM_EPS,
            False,
            explain,
        )
        return y.reshape(n_, h_, w2_, -1).astype(x.dtype)

    import os as _os

    if (
        explain
        and isinstance(b, (int, float))
        and b == 2
        and max_out == 1
        and _os.getenv("BCOS_EXPLAIN_CONV", "0") == "1"
    ):
        return _b2_explain_conv(
            x,
            wn.astype(x.dtype),
            bias,
            _pair(stride),
            _pair(padding),
            _pair(dilation),
            groups,
        )

    out = _conv(
        x, wn.astype(x.dtype), stride, padding, dilation, groups,
        allow_int8=(not explain) if allow_int8 is None else allow_int8,
    )
    if bias is not None:
        out = out + jnp.reshape(bias, (1, 1, 1, -1)).astype(out.dtype)

    if max_out > 1:
        out = jnp.max(
            out.reshape(*out.shape[:-1], out_channels, max_out), axis=-1
        )

    if isinstance(b, (int, float)) and b == 1:
        return out

    norm = patch_norms(
        x,
        w.shape[:2],
        stride=stride,
        padding=padding,
        dilation=dilation,
        groups=groups,
        out_channels=out_channels,
        x_sumsq=x_sumsq,
    ).astype(out.dtype)

    return dynamic_scale(out, norm, b, explain=explain) * out


def bcos_conv2d_reference(
    x: jax.Array,
    w: jax.Array,
    *,
    b: Union[float, jax.Array] = 2.0,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    max_out: int = 1,
    normalize_weights: bool = True,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    explain: bool = False,
) -> jax.Array:
    """Naive two-pass oracle using the ones-kernel patch norm. Test-only."""
    out_channels = w.shape[-1] // max_out
    wn = normed_conv_weight(w, scale) if normalize_weights else w
    out = _conv(x, wn, stride, padding, dilation, groups)
    if bias is not None:
        out = out + jnp.reshape(bias, (1, 1, 1, -1))
    if max_out > 1:
        out = jnp.max(out.reshape(*out.shape[:-1], out_channels, max_out), axis=-1)
    if isinstance(b, (int, float)) and b == 1:
        return out
    # ones-kernel norm has shape [..., out*max_out]; per-group norms are equal
    # across the group's channels so slicing the first of each maxout block is
    # equivalent to the fast path's repeat.
    norm_shape = (w.shape[0], w.shape[1], w.shape[2], w.shape[3])
    norm = patch_norms_reference(
        x, norm_shape, stride=stride, padding=padding, dilation=dilation, groups=groups
    )
    if max_out > 1:
        norm = norm[..., ::max_out]
    norm = norm.astype(out.dtype)
    return dynamic_scale(out, norm, b, explain=explain) * out


def bcos_linear(
    x: jax.Array,
    w: jax.Array,
    *,
    b: Union[float, jax.Array] = 2.0,
    max_out: int = 1,
    normalize_weights: bool = True,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    explain: bool = False,
) -> jax.Array:
    """B-cos linear transform over the last axis. w: (in, out*max_out).

    Mirrors `BcosLinear.forward` (bcoslinear.py:88-130) /
    `BcosifyLinear.forward` (bcosifylinear.py:42-95, normalize_weights=False).
    """
    out_features = w.shape[-1] // max_out
    wn = normed_linear_weight(w, scale) if normalize_weights else w
    out = jnp.dot(
        x,
        wn.astype(x.dtype),
        precision=jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )
    if bias is not None:
        out = out + bias
    if max_out > 1:
        out = jnp.max(out.reshape(*out.shape[:-1], out_features, max_out), axis=-1)
    if isinstance(b, (int, float)) and b == 1:
        return out
    norm = (
        jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
        + LINEAR_NORM_EPS
    ).astype(out.dtype)
    return dynamic_scale(out, norm, b, explain=explain) * out


def normed_conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    use_weight_norm: bool = True,
    allow_int8: bool = False,
) -> jax.Array:
    """Plain conv with unit-norm weights (`NormedConv2d`, bcosconv2d.py:17-41)."""
    wn = normed_conv_weight(w, scale) if use_weight_norm else w
    out = _conv(
        x, wn.astype(x.dtype), stride, padding, dilation, groups,
        allow_int8=allow_int8,
    )
    if bias is not None:
        out = out + jnp.reshape(bias, (1, 1, 1, -1)).astype(out.dtype)
    return out


def normed_linear(
    x: jax.Array,
    w: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    scale: Optional[jax.Array] = None,
    use_weight_norm: bool = True,
) -> jax.Array:
    """Plain linear with unit-norm weights (`NormedLinear`, bcoslinear.py:20-27)."""
    wn = normed_linear_weight(w, scale) if use_weight_norm else w
    out = x @ wn.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out

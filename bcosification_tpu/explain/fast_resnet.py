"""Hand-scheduled explain pass for B-cosified ResNets (the flagship family).

Computes exactly what ``explain.core.dynamic_linear_weights`` computes —
logits plus W(x) = d logit[selected] / d x of the explanation-variant forward
(detach semantics of `/root/reference/bcos/common.py:92-188` +
`bcosconv2d.py:181-193`) — but with an explicitly written linear backward
instead of ``jax.vjp``:

Why (measured on v5e, RN50 fwd+explain, bf16, batch 128, round 2):

- autodiff residualises the activation-sized dynamic-scale tensor of every
  B-cos conv (one extra HBM write in the forward + read in the backward);
- an ablation puts the whole dynamic-scale machinery at 5.2 ms of the 31.5 ms
  step (b=1 vs b=2 build, scripts/perf_probe8.py), i.e. ~17% of the step is
  residual traffic + patch-norm cost;
- every custom_vjp attempt to drop that residual lost more at the fwd/bwd
  boundary than it saved (scale-mul 3636, whole-layer 3887, segment 3939
  img/s vs 4110 default — boundary copies / lost conv merges; docs/PERF.md).

Here there is NO custom_vjp and NO jax.vjp: the backward is ordinary jnp code
in the same traced graph, so XLA sees one seamless program. Every dynamic
scale is reconstructed from tensors the program materialises anyway:

    segment:  u -conv-> y = (|u|/n) u -> z = y*(gamma/std) [+beta]
              [+identity] [-> relu] = out
    backward: mask = out > 0 (from out);  |y| = |out - identity - beta| / |m|
              => scale = |u|/n = sqrt(|y|/n)   (from out!)
              ct_u = ct * mask * sign(m) sqrt(|m|) sqrt(|zz|/n)

so the only stored per-segment extras are the patch norms n (C-times smaller
than an activation). Convolution transposes go through jax.linear_transpose
of the plain conv — identical HLO to what autodiff would emit.

Numerics: values (logits) follow the module path op-for-op (same op order,
same casts), W matches autodiff to rounding (the sqrt reconstruction and the
``out - identity`` cancellation add O(ulp) noise in near-zero-cosine regions
only; asserted in tests/test_fast_explain.py on CPU fp32 at 1e-5).

Scope: BcosifyNetwork(BcosResNet) with b=2, groups=1, max_out=1, uncentered
running-var BN (any affine flags), ReLU/Identity activations, avg stem pool,
GAP-reorder classifier, no stochastic depth — i.e. every
`ImageNet/bcosification` CONFIGS resnet variant. `supports()` checks this;
callers fall back to the generic autodiff path otherwise.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bcosification_tpu.ops import bcos as ops
from bcosification_tpu.ops import pooling

__all__ = ["supports", "fast_dynamic_linear_weights"]


def _probe(layer_factory, **kwargs):
    try:
        return layer_factory(**kwargs)
    except Exception:
        return None


def supports(net) -> bool:
    """True if ``net`` is a BcosifyNetwork(BcosResNet) this pass handles."""
    from bcosification_tpu.models.bcosify_net import BcosifyNetwork
    from bcosification_tpu.models.resnet import BcosResNet
    from bcosification_tpu.modules import BcosConv2d, BcosifyConv2d, Identity, ReLU
    from bcosification_tpu.modules import norms as norms_lib

    if not isinstance(net, BcosifyNetwork) or not isinstance(net.model, BcosResNet):
        return False
    m = net.model
    if (
        m.groups != 1
        or m.width_per_group != 64
        or m.stem_pool != "avg"
        or not m.gap_reorder
        or m.small_inputs
        or m.stochastic_depth_prob
        or m.with_logit_layer  # LogitLayer must live in the wrapper
    ):
        return False
    conv = _probe(m.conv_layer, features=4, kernel_size=1)
    fc = _probe(m.fc_layer or m.conv_layer, features=4, kernel_size=1)
    norm = _probe(m.norm_layer, features=4)
    act = _probe(m.act_layer)
    for c in (conv, fc):
        if (
            type(c) not in (BcosConv2d, BcosifyConv2d)  # excludes WithScale
            or c.b != 2
            or c.max_out != 1
            or getattr(c, "clamping", False)
            or getattr(c, "b_loss", False)
            or getattr(c, "learnable_b", False)
        ):
            return False
    if conv.use_bias:  # trunk convs must be bias-free (fc bias is handled)
        return False
    # the pass derives ONE weight-normalization decision from conv_layer and
    # applies it to fc too — mixed trunk/fc configs would compute wrongly
    if type(conv) is not type(fc) or (
        getattr(conv, "normalize_weights", False)
        != getattr(fc, "normalize_weights", False)
    ):
        return False
    if not isinstance(norm, norms_lib.BatchNormUncentered2d):
        return False
    if not isinstance(act, (ReLU, Identity)):
        return False
    return True


def _normalize_weights(net) -> bool:
    from bcosification_tpu.modules import BcosifyConv2d

    conv = net.model.conv_layer(features=4, kernel_size=1)
    if isinstance(conv, BcosifyConv2d):
        return False  # raw pretrained weights (bcosifyconv2d.py:7-102)
    return conv.normalize_weights


def _weight(p: Dict[str, Any], normalize: bool, dtype) -> jax.Array:
    w = p["weight"]
    if normalize:
        w = ops.normed_conv_weight(w)
    return w.astype(dtype)


def _bn_terms(p, bs, eps: float):
    """(std, gamma, beta, sm) for one BN: std=sqrt(rv+eps) f32, sm the
    backward factor sign(m)*sqrt(|m|) with m = gamma/std."""
    std = jnp.sqrt(bs["running_var"] + eps)
    gamma = p.get("weight") if p is not None else None
    beta = p.get("bias") if p is not None else None
    m = (gamma / std) if gamma is not None else (1.0 / std)
    sm = jnp.sign(m) * jnp.sqrt(jnp.abs(m))
    return std, gamma, beta, sm


def _seg_fwd(u, n, std, gamma, beta, relu: bool):
    """Value path, op-for-op like modules (BcosifyConv2d -> BN -> ReLU):
    dynamic scale in u.dtype, BN divide in u.dtype, affine in f32, cast."""
    y = (jnp.abs(u) / n) * u
    r = y / std.astype(u.dtype)
    if gamma is not None:
        r = r * gamma
    if beta is not None:
        r = r + beta
    z = r.astype(u.dtype)
    if relu:
        z = jnp.maximum(z, 0)
    return z


def _seg_bwd(ct, z, n, sm, beta, relu: bool, identity=None):
    """ct_u from the segment output z (scale reconstructed, see module
    docstring). Returns (ct_u, ct_identity_or_None)."""
    if relu:
        ct = jnp.where(z > 0, ct, jnp.zeros_like(ct))
    zz = z
    if identity is not None:
        zz = zz - identity
    if beta is not None:
        zz = (zz.astype(jnp.float32) - beta).astype(z.dtype)
    ct_u = ct * sm.astype(z.dtype) * jnp.sqrt(jnp.abs(zz) / n)
    return ct_u, (ct if identity is not None else None)


def _norms(x, kh, kw, stride, padding, dtype):
    return ops.patch_norms(x, (kh, kw), stride=stride, padding=padding).astype(dtype)


def _aug_norm_enabled() -> bool:
    """BCOS_AUG_NORM=1: fold each layer's patch norm into its OWN conv call.

    The last untried structural idea (docs/PERF.md): the step is
    kernel-boundary-bound, so deleting the per-layer reduce_window kernel in
    favour of a slightly larger conv may be free. One extra INPUT channel
    carries the per-pixel channel sum-of-squares (sum_c x_c^2 — computable in
    the producer's elementwise fusion), and one extra OUTPUT column of ones
    window-sums it: that output channel is exactly ||x_patch||^2, because

        sum_{dy,dx} ssq[y+dy, x+dx] = sum_{dy,dx,c} x[y+dy, x+dx, c]^2.

    Cost: ~(1/C_in + 1/C_out) extra MACs and TPU lane padding on the C+1
    tensors; benefit: the reduce_window kernel and one full activation read
    per layer disappear. Exact up to fp reassociation (MXU accumulates the
    sumsq column in fp32 like reduce_window; in bf16 the ssq channel itself
    is rounded to bf16 — a ~2^-9 relative perturbation of the norm that the
    default path does not have, which is why this is opt-in + measured).
    """
    import os

    return os.getenv("BCOS_AUG_NORM", "0") == "1"


def _conv_and_norm(a, w, stride, padding, dtype):
    """(u, n) = (conv(a, w), patch norms of a) — two kernels by default, ONE
    augmented conv under BCOS_AUG_NORM=1 (see _aug_norm_enabled)."""
    kh, kw, cin, cout = w.shape
    if not _aug_norm_enabled():
        u = ops._conv(a, w, stride, padding, 1, 1)
        return u, _norms(a, kh, kw, stride, padding, dtype)
    ssq = jnp.sum(jnp.square(a.astype(jnp.float32)), axis=-1, keepdims=True)
    xa = jnp.concatenate([a, ssq.astype(a.dtype)], axis=-1)
    wa = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 1)))
    # constant one-hot tap (no traced operands -> folded at compile time)
    ones_tap = jnp.zeros(wa.shape, wa.dtype).at[:, :, cin, cout].set(1.0)
    y = ops._conv(xa, wa + ones_tap, stride, padding, 1, 1)
    u = y[..., :cout]
    n = jnp.sqrt(y[..., cout:].astype(jnp.float32) + ops.CONV_NORM_EPS)
    return u, n.astype(dtype)


def _convT2x(ct, w, x_shape, padding: int):
    """Transpose of a stride-2 conv as ONE dense stride-1 conv + depth-to-space.

    XLA lowers the gradient of a strided conv as an input-dilated conv — on
    the MXU that multiplies a 75% zero tensor (4x wasted systolic work), and
    for the 7x7/s2 6-channel RN50 stem it additionally runs with 6 of 128
    output lanes live (measured 1.9 ms vs ~0.15 ms ideal, scripts/
    perf_probe6.py). Phase decomposition removes both: writing the output as
    y = 2q + a, x = 2r + b (a,b in {0,1}) makes each phase a small dense
    conv over ct, and stacking all four phases in the channel dim gives one
    conv with 4*cin output channels (24 lanes for the stem instead of 6,
    zero dilation), followed by a reshuffle:

        dx[n, 2q+a, 2r+b, c] = conv(ct, w2)[n, q, r, (a*2+b)*cin + c]
        w2[i, j, o, (a*2+b)*cin + c] = w[ky, kx, c, o],
            ky = a + padding - 2*(i + oymin), i the window position

    Measured on the RN50 stem dx (batch 128 bf16, v5e): 2.10 ms dilated ->
    1.31 ms phase block=2. A block-4 variant (16 phases, 96 lanes) measured
    1.39 ms — the bigger depth-to-space shuffle and 2x padded kernel FLOPs
    eat the extra lane utilisation, so block is pinned at 2.

    Exact same sum as the dilated form (up to fp reassociation).
    Requires x spatial dims == 2 * ct spatial dims (RN50 shapes satisfy it).
    """
    kh, kw, cin, cout = w.shape
    n, hc, wc, _ = ct.shape
    block = 2
    sconv = block // 2  # stride of the phase conv over ct

    def phase_offsets(k):
        per_phase = {}
        for a in range(block):
            per_phase[a] = [
                ((a + padding - ky) // 2, ky)
                for ky in range(k)
                if (a + padding - ky) % 2 == 0
            ]
        return per_phase

    oy, ox = phase_offsets(kh), phase_offsets(kw)
    oymin = min(o for v in oy.values() for o, _ in v)
    oymax = max(o for v in oy.values() for o, _ in v)
    oxmin = min(o for v in ox.values() for o, _ in v)
    oxmax = max(o for v in ox.values() for o, _ in v)
    wy, wx = oymax - oymin + 1, oxmax - oxmin + 1

    w2 = jnp.zeros((wy, wx, cout, block * block * cin), w.dtype)
    for a in range(block):
        for b in range(block):
            m0 = (a * block + b) * cin
            for off_y, ky in oy[a]:
                for off_x, kx in ox[b]:
                    w2 = w2.at[
                        off_y - oymin, off_x - oxmin, :, m0 : m0 + cin
                    ].set(w[ky, kx].T)

    lo_y, lo_x = -oymin, -oxmin
    # output length (hc*2)/block needs input span (hc*2/block - 1)*sconv + wy
    hi_y = (2 * hc // block - 1) * sconv + wy - lo_y - hc
    hi_x = (2 * wc // block - 1) * sconv + wx - lo_x - wc
    out = jax.lax.conv_general_dilated(
        ct, w2, window_strides=(sconv, sconv),
        padding=((lo_y, hi_y), (lo_x, hi_x)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # fp32 convs stay exactly fp32, matching ops._conv (CLAUDE.md)
        precision=(
            jax.lax.Precision.HIGHEST if ct.dtype == jnp.float32 else None
        ),
    )
    qh, qw = 2 * hc // block, 2 * wc // block
    out = out.reshape(n, qh, qw, block, block, cin)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, 2 * hc, 2 * wc, cin)


def _convT(ct, w, x_shape, stride, padding):
    if (
        stride == 2
        and w.shape[0] > 1
        and x_shape[1] == 2 * ct.shape[1]
        and x_shape[2] == 2 * ct.shape[2]
    ):
        return _convT2x(ct, w, x_shape, int(padding))

    def f(t):
        return ops._conv(t, w, stride, padding, 1, 1)

    (dx,) = jax.linear_transpose(
        f, jax.ShapeDtypeStruct(x_shape, ct.dtype)
    )(ct)
    return dx


def fast_dynamic_linear_weights(
    net,
    variables: Dict[str, Any],
    x: jax.Array,
    idx: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(logits, selected_idx, W) — drop-in for
    ``dynamic_linear_weights(lambda t: net.apply(variables, t, train=False,
    explain=True), x, idx)`` when ``supports(net)``."""
    assert supports(net), "fast explain pass: unsupported model (see supports())"
    m = net.model
    params = variables["params"]["model"]
    stats = variables["batch_stats"]["model"]
    dtype = x.dtype
    normalize = _normalize_weights(net)
    eps = m.norm_layer(features=4).eps
    block_cls, expansion, cfgs, _ = m._block_cfgs()
    bottleneck = m.block == "bottleneck"

    # ---------------- forward (explanation-variant values) ----------------
    mean = jnp.asarray(net.mean, dtype)
    std_in = jnp.asarray(net.std, dtype)
    xn = (x - mean) / std_in

    from bcosification_tpu.modules import ReLU

    relu_acts = isinstance(m.act_layer(), ReLU)

    w1 = _weight(params["conv1"], normalize, dtype)
    u, n1 = _conv_and_norm(xn, w1, 2, 3, dtype)
    bn1 = _bn_terms(params.get("bn1"), stats["bn1"], eps)
    z_stem = _seg_fwd(u, n1, bn1[0], bn1[1], bn1[2], relu_acts)
    a = pooling.avg_pool2d(z_stem, 3, 2, 1)

    acts = []  # per-block forward record for the backward sweep
    for stage, j, planes, stride, has_ds, _sd in cfgs:
        scope = f"layer{stage + 1}_{j}"
        p, s = params[scope], stats[scope]
        rec = {"in": a, "scope": scope, "stride": stride, "has_ds": has_ds}
        if has_ds:
            wds = _weight(p["downsample_conv"], normalize, dtype)
            uds, rec["n_ds"] = _conv_and_norm(a, wds, stride, 0, dtype)
            rec["bn_ds"] = _bn_terms(
                p.get("downsample_norm"), s["downsample_norm"], eps
            )
            rec["w_ds"] = wds
            identity = _seg_fwd(
                uds, rec["n_ds"], rec["bn_ds"][0], rec["bn_ds"][1],
                rec["bn_ds"][2], False,
            )
            rec["id_out"] = identity
        else:
            identity = a

        if bottleneck:
            rec["w1"] = _weight(p["conv1"], normalize, dtype)
            u, rec["n1"] = _conv_and_norm(a, rec["w1"], 1, 0, dtype)
            rec["bn1"] = _bn_terms(p.get("bn1"), s["bn1"], eps)
            c1 = _seg_fwd(u, rec["n1"], rec["bn1"][0], rec["bn1"][1],
                          rec["bn1"][2], relu_acts)
            rec["c1"] = c1

            rec["w2"] = _weight(p["conv2"], normalize, dtype)
            u, rec["n2"] = _conv_and_norm(c1, rec["w2"], stride, 1, dtype)
            rec["bn2"] = _bn_terms(p.get("bn2"), s["bn2"], eps)
            c2 = _seg_fwd(u, rec["n2"], rec["bn2"][0], rec["bn2"][1],
                          rec["bn2"][2], relu_acts)
            rec["c2"] = c2

            rec["w3"] = _weight(p["conv3"], normalize, dtype)
            u, rec["n3"] = _conv_and_norm(c2, rec["w3"], 1, 0, dtype)
            rec["bn3"] = _bn_terms(p.get("bn3"), s["bn3"], eps)
            y3 = _seg_fwd(u, rec["n3"], rec["bn3"][0], rec["bn3"][1],
                          rec["bn3"][2], False)
        else:
            rec["w1"] = _weight(p["conv1"], normalize, dtype)
            u, rec["n1"] = _conv_and_norm(a, rec["w1"], stride, 1, dtype)
            rec["bn1"] = _bn_terms(p.get("bn1"), s["bn1"], eps)
            c1 = _seg_fwd(u, rec["n1"], rec["bn1"][0], rec["bn1"][1],
                          rec["bn1"][2], relu_acts)
            rec["c1"] = c1

            rec["w2"] = _weight(p["conv2"], normalize, dtype)
            u, rec["n2"] = _conv_and_norm(c1, rec["w2"], 1, 1, dtype)
            rec["bn2"] = _bn_terms(p.get("bn2"), s["bn2"], eps)
            y3 = _seg_fwd(u, rec["n2"], rec["bn2"][0], rec["bn2"][1],
                          rec["bn2"][2], False)

        out = y3 + identity
        if relu_acts:
            out = jnp.maximum(out, 0)
        rec["out"] = out
        acts.append(rec)
        a = out

    # classifier: 1x1 B-cos conv BEFORE global average pool (GAP-reorder,
    # standard_models.py:38-55), then LogitLayer in the wrapper
    w_fc = _weight(params["fc"], normalize, dtype)
    u_fc, n_fc = _conv_and_norm(a, w_fc, 1, 0, dtype)
    fc_bias = params["fc"].get("bias")
    if fc_bias is not None:
        u_fc = u_fc + jnp.reshape(fc_bias, (1, 1, 1, -1)).astype(dtype)
    y_fc = (jnp.abs(u_fc) / n_fc) * u_fc
    logits = jnp.mean(y_fc, axis=(1, 2))
    if net.with_logit_layer:
        if net.logit_temperature is not None:
            logits = logits / net.logit_temperature
        lb = (
            -math.log(net.num_classes - 1)
            if net.logit_bias is None
            else net.logit_bias
        )
        logits = logits + lb

    # ---------------- backward (explicit linear transpose) ----------------
    sel = (
        jnp.argmax(logits, axis=1)
        if idx is None
        else jnp.broadcast_to(idx, (logits.shape[0],))
    )
    ct = jax.nn.one_hot(sel, logits.shape[-1], dtype=logits.dtype)
    if net.with_logit_layer and net.logit_temperature is not None:
        ct = ct / net.logit_temperature
    hw = y_fc.shape[1] * y_fc.shape[2]
    ct_yfc = jnp.broadcast_to(
        (ct / hw)[:, None, None, :].astype(dtype), y_fc.shape
    )
    s_fc = jnp.sqrt(jnp.abs(y_fc) / n_fc)
    ct_a = _convT(ct_yfc * s_fc, w_fc, a.shape, 1, 0)

    for rec in reversed(acts):
        stride, has_ds = rec["stride"], rec["has_ds"]
        identity = rec["id_out"] if has_ds else rec["in"]
        if bottleneck:
            ct_y3, ct_id = _seg_bwd(
                ct_a, rec["out"], rec["n3"], rec["bn3"][3], rec["bn3"][2],
                relu_acts, identity=identity,
            )
            ct_c2 = _convT(ct_y3, rec["w3"], rec["c2"].shape, 1, 0)
            ct_u2, _ = _seg_bwd(
                ct_c2, rec["c2"], rec["n2"], rec["bn2"][3], rec["bn2"][2],
                relu_acts,
            )
            ct_c1 = _convT(ct_u2, rec["w2"], rec["c1"].shape, stride, 1)
            ct_u1, _ = _seg_bwd(
                ct_c1, rec["c1"], rec["n1"], rec["bn1"][3], rec["bn1"][2],
                relu_acts,
            )
            ct_in = _convT(ct_u1, rec["w1"], rec["in"].shape, 1, 0)
        else:
            ct_y2, ct_id = _seg_bwd(
                ct_a, rec["out"], rec["n2"], rec["bn2"][3], rec["bn2"][2],
                relu_acts, identity=identity,
            )
            ct_c1 = _convT(ct_y2, rec["w2"], rec["c1"].shape, 1, 1)
            ct_u1, _ = _seg_bwd(
                ct_c1, rec["c1"], rec["n1"], rec["bn1"][3], rec["bn1"][2],
                relu_acts,
            )
            ct_in = _convT(ct_u1, rec["w1"], rec["in"].shape, stride, 1)

        if has_ds:
            ct_uds, _ = _seg_bwd(
                ct_id, rec["id_out"], rec["n_ds"], rec["bn_ds"][3],
                rec["bn_ds"][2], False,
            )
            ct_in = ct_in + _convT(
                ct_uds, rec["w_ds"], rec["in"].shape, stride, 0
            )
        else:
            ct_in = ct_in + ct_id
        ct_a = ct_in

    # stem: avg-pool transpose, stem segment, 7x7 conv transpose, normalise
    (ct_zstem,) = jax.linear_transpose(
        lambda t: pooling.avg_pool2d(t, 3, 2, 1),
        jax.ShapeDtypeStruct(z_stem.shape, dtype),
    )(ct_a)
    ct_u0, _ = _seg_bwd(ct_zstem, z_stem, n1, bn1[3], bn1[2], relu_acts)
    ct_xn = _convT(ct_u0, w1, xn.shape, 2, 3)
    w = ct_xn / std_in
    return logits, sel, w

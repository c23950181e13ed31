"""Hand-scheduled explain pass for the B-cosified CLIP image tower.

Extends the fast_resnet technique (explicit linear backward in the same traced
graph, dynamic scales reconstructed from layer outputs, zero scale residuals)
to `ModifiedResNet` — the text-localisation workload's model
(`/root/reference/interpretability/analyses/text_localisation.py:68-126`,
tower `/root/reference/CLIP/clip/model.py:94-155`, bcosified per
`/root/reference/bcosify.py:74-114`):

- 3-conv stem (3x3/s2 on 6 channels + two 3x3/s1) + 2x2 avgpool;
- anti-aliased bottlenecks: all convs stride 1, avgpool between conv2 and
  conv3 when the block downsamples, downsample branch = avgpool + 1x1 conv;
- `BcosAttentionPool2d` head (q/k detached in explain mode) or its
  attn_unpool variant. The head operates on [B, 50, 2048]-sized tensors —
  negligible next to the trunk — so its backward goes through a local
  `jax.vjp` over the exact module ops (ops.bcos_linear for c_proj), while
  the trunk forward+backward is hand-scheduled with the fast_resnet
  primitives (_seg_fwd/_seg_bwd/_convT/_norms).

Values are IDENTICAL to `net.apply(variables, x, train=False, explain=True)`
(same op order and casts); W matches the autodiff backward to rounding
(tests/test_fast_clip_explain.py, fp32 1e-5).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from bcosification_tpu.explain.fast_resnet import (
    _bn_terms,
    _convT,
    _norms,
    _seg_bwd,
    _seg_fwd,
)
from bcosification_tpu.ops import bcos as ops
from bcosification_tpu.ops import pooling

__all__ = ["supports", "fast_encode_and_vjp", "fast_text_dlw", "text_score_head"]


def supports(net) -> bool:
    """True for BcosifyNetwork(ModifiedResNet) in the production CLIP recipe
    (BcosifyConv2d b=2 trunk, uncentered BN, ReLU, bcos/bcos_unpool head)."""
    from bcosification_tpu.clip.model import ModifiedResNet, _ReLU
    from bcosification_tpu.models.bcosify_net import BcosifyNetwork
    from bcosification_tpu.modules import BcosifyConv2d, BcosifyLinear
    from bcosification_tpu.modules import norms as norms_lib

    if not isinstance(net, BcosifyNetwork) or not isinstance(
        net.model, ModifiedResNet
    ):
        return False
    m = net.model
    if m.attnpool not in ("bcos", "bcos_unpool"):
        return False
    try:
        conv = m.conv_layer(features=4, kernel_size=1)
        norm = m.norm_layer(features=4)
        act = m.act_layer()
        cproj = m.attnpool_c_proj_layer(features=4)
    except Exception:
        return False
    if (
        not isinstance(conv, BcosifyConv2d)
        or conv.b != 2
        or conv.max_out != 1
        or conv.use_bias
        or getattr(conv, "clamping", False)
        or getattr(conv, "b_loss", False)
        or getattr(conv, "learnable_b", False)
    ):
        return False
    if not isinstance(norm, norms_lib.BatchNormUncentered2d):
        return False
    if not isinstance(act, _ReLU):
        return False
    if not isinstance(cproj, BcosifyLinear) or cproj.b != 2 or cproj.max_out != 1:
        return False
    return True


def _attnpool_fn(net, p: Dict[str, Any]) -> Callable:
    """The exact BcosAttentionPool2d explain-mode ops as a pure function of
    the trunk feature map (modules/bcosattnpool.py:76-120)."""
    from bcosification_tpu.modules.bcosattnpool import _mha

    m = net.model
    unpool = m.attnpool == "bcos_unpool"
    heads = m.heads

    def lin(name, t, weight_only=False):
        w = p[name]["weight"].astype(t.dtype)
        out = jnp.dot(
            t, w,
            precision=jax.lax.Precision.HIGHEST if t.dtype == jnp.float32 else None,
        )
        if not weight_only and "bias" in p[name]:
            out = out + p[name]["bias"]
        return out

    def cproj_bcos(t):
        return ops.bcos_linear(
            t,
            p["c_proj"]["weight"],
            b=2.0,
            normalize_weights=False,
            bias=p["c_proj"].get("bias"),
            explain=True,
        )

    def run(a):
        b, h, w, c = a.shape
        seq = a.reshape(b, h * w, c)
        if unpool:
            out = cproj_bcos(lin("v_proj", seq))
            norm = jax.lax.stop_gradient(
                jnp.linalg.norm(out, axis=-1, keepdims=True)
            )
            return out / norm  # [B, HW, D]
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        sg = jax.lax.stop_gradient(seq)
        # pooled path: ALL projections weight-only and c_proj applied PLAIN
        # (ref bcosattnpool.py:40-59 — F.multi_head_attention_forward with
        # in_proj_bias=None, out_proj_weight=c_proj.weight)
        q = lin("q_proj", sg[:, :1], weight_only=True)
        k = lin("k_proj", sg, weight_only=True)
        v = lin("v_proj", seq, weight_only=True)
        out = lin("c_proj", _mha(q, k, v, heads), weight_only=True)
        return out[:, 0]  # [B, D]

    return run


def fast_encode_and_vjp(
    net, variables: Dict[str, Any], x: jax.Array
) -> Tuple[jax.Array, Callable[[jax.Array], jax.Array]]:
    """(features, vjp_fn) where features == the explain-mode encode and
    vjp_fn(ct_features) -> W = d(features . ct)/dx with the trunk backward
    hand-scheduled. Both usable under jit."""
    assert supports(net), "fast CLIP explain: unsupported model (see supports())"
    m = net.model
    params = variables["params"]["model"]
    stats = variables["batch_stats"]["model"]
    dtype = x.dtype
    eps = m.norm_layer(features=4).eps
    width = m.width

    mean = jnp.asarray(net.mean, dtype)
    std_in = jnp.asarray(net.std, dtype)
    xn = (x - mean) / std_in

    def W(scope):
        return params[scope]["weight"].astype(dtype)

    # ---------------- stem: three 3x3 segments + 2x2 avgpool ----------------
    stem = []
    a = xn
    for i, (features, stride) in enumerate(
        [(width // 2, 2), (width // 2, 1), (width, 1)], start=1
    ):
        scope = f"conv{i}"
        w = W(scope)
        u = ops._conv(a, w, stride, 1, 1, 1)
        n = _norms(a, 3, 3, stride, 1, dtype)
        bn = _bn_terms(params.get(f"bn{i}"), stats[f"bn{i}"], eps)
        z = _seg_fwd(u, n, bn[0], bn[1], bn[2], True)
        stem.append({"in": a, "w": w, "n": n, "bn": bn, "z": z, "stride": stride})
        a = z
    z_stem = a
    a = pooling.avg_pool2d(a, 2, 2)

    # ---------------- anti-aliased bottlenecks ------------------------------
    acts = []
    inplanes = width
    for stage, n_blocks in enumerate(m.layers):
        planes = width * (2**stage)
        for j in range(n_blocks):
            stride = 2 if (stage > 0 and j == 0) else 1
            has_ds = stride > 1 or inplanes != planes * 4
            scope = f"layer{stage + 1}_{j}"
            p, s = params[scope], stats[scope]
            rec = {"in": a, "stride": stride, "has_ds": has_ds}

            rec["w1"] = p["conv1"]["weight"].astype(dtype)
            u = ops._conv(a, rec["w1"], 1, 0, 1, 1)
            rec["n1"] = _norms(a, 1, 1, 1, 0, dtype)
            rec["bn1"] = _bn_terms(p.get("bn1"), s["bn1"], eps)
            c1 = _seg_fwd(u, rec["n1"], rec["bn1"][0], rec["bn1"][1], rec["bn1"][2], True)
            rec["c1"] = c1

            rec["w2"] = p["conv2"]["weight"].astype(dtype)
            u = ops._conv(c1, rec["w2"], 1, 1, 1, 1)
            rec["n2"] = _norms(c1, 3, 3, 1, 1, dtype)
            rec["bn2"] = _bn_terms(p.get("bn2"), s["bn2"], eps)
            c2 = _seg_fwd(u, rec["n2"], rec["bn2"][0], rec["bn2"][1], rec["bn2"][2], True)
            rec["c2"] = c2

            c2p = pooling.avg_pool2d(c2, stride, stride) if stride > 1 else c2
            rec["c2p"] = c2p
            rec["w3"] = p["conv3"]["weight"].astype(dtype)
            u = ops._conv(c2p, rec["w3"], 1, 0, 1, 1)
            rec["n3"] = _norms(c2p, 1, 1, 1, 0, dtype)
            rec["bn3"] = _bn_terms(p.get("bn3"), s["bn3"], eps)
            y3 = _seg_fwd(u, rec["n3"], rec["bn3"][0], rec["bn3"][1], rec["bn3"][2], False)

            if has_ds:
                idp = pooling.avg_pool2d(a, stride, stride) if stride > 1 else a
                rec["idp"] = idp
                rec["w_ds"] = p["downsample_conv"]["weight"].astype(dtype)
                uds = ops._conv(idp, rec["w_ds"], 1, 0, 1, 1)
                rec["n_ds"] = _norms(idp, 1, 1, 1, 0, dtype)
                rec["bn_ds"] = _bn_terms(
                    p.get("downsample_norm"), s["downsample_norm"], eps
                )
                identity = _seg_fwd(
                    uds, rec["n_ds"], rec["bn_ds"][0], rec["bn_ds"][1],
                    rec["bn_ds"][2], False,
                )
                rec["id_out"] = identity
            else:
                identity = a

            out = jnp.maximum(y3 + identity, 0)
            rec["out"] = out
            acts.append(rec)
            a = out
            inplanes = planes * 4

    # ---------------- attention-pool head (tiny): local jax.vjp -------------
    feats, pool_vjp = jax.vjp(_attnpool_fn(net, params["attnpool"]), a)

    def vjp_fn(ct_feats: jax.Array) -> jax.Array:
        (ct_a,) = pool_vjp(ct_feats.astype(feats.dtype))

        for rec in reversed(acts):
            stride, has_ds = rec["stride"], rec["has_ds"]
            identity = rec["id_out"] if has_ds else rec["in"]
            ct_y3, ct_id = _seg_bwd(
                ct_a, rec["out"], rec["n3"], rec["bn3"][3], rec["bn3"][2],
                True, identity=identity,
            )
            ct_c2p = _convT(ct_y3, rec["w3"], rec["c2p"].shape, 1, 0)
            if stride > 1:
                (ct_c2,) = jax.linear_transpose(
                    lambda t: pooling.avg_pool2d(t, stride, stride),
                    jax.ShapeDtypeStruct(rec["c2"].shape, ct_c2p.dtype),
                )(ct_c2p)
            else:
                ct_c2 = ct_c2p
            ct_u2, _ = _seg_bwd(
                ct_c2, rec["c2"], rec["n2"], rec["bn2"][3], rec["bn2"][2], True
            )
            ct_c1 = _convT(ct_u2, rec["w2"], rec["c1"].shape, 1, 1)
            ct_u1, _ = _seg_bwd(
                ct_c1, rec["c1"], rec["n1"], rec["bn1"][3], rec["bn1"][2], True
            )
            ct_in = _convT(ct_u1, rec["w1"], rec["in"].shape, 1, 0)

            if has_ds:
                ct_uds, _ = _seg_bwd(
                    ct_id, rec["id_out"], rec["n_ds"], rec["bn_ds"][3],
                    rec["bn_ds"][2], False,
                )
                ct_idp = _convT(ct_uds, rec["w_ds"], rec["idp"].shape, 1, 0)
                if stride > 1:
                    (ct_idin,) = jax.linear_transpose(
                        lambda t: pooling.avg_pool2d(t, stride, stride),
                        jax.ShapeDtypeStruct(rec["in"].shape, ct_idp.dtype),
                    )(ct_idp)
                else:
                    ct_idin = ct_idp
                ct_in = ct_in + ct_idin
            else:
                ct_in = ct_in + ct_id
            ct_a = ct_in

        # stem: avgpool transpose, then the three segments in reverse
        (ct,) = jax.linear_transpose(
            lambda t: pooling.avg_pool2d(t, 2, 2),
            jax.ShapeDtypeStruct(z_stem.shape, ct_a.dtype),
        )(ct_a)
        for rec in reversed(stem):
            ct_u, _ = _seg_bwd(ct, rec["z"], rec["n"], rec["bn"][3], rec["bn"][2], True)
            ct = _convT(ct_u, rec["w"], rec["in"].shape, rec["stride"], 1)
        return ct / std_in

    return feats, vjp_fn


def text_score_head(feats: jax.Array, t: jax.Array) -> jax.Array:
    """Per-sample text-grounded score, reference default semantics
    (text_localisation.py:77-100, pool_cosine=1): cosine-normalise the
    features DIFFERENTIABLY (the reference has no detach there — the
    explain-mode backward flows through the norm), per location for
    attn-unpool feats, then mean the per-location cosines."""
    td = t.astype(feats.dtype)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    if feats.ndim == 3:  # [B, HW, D] attn-unpool
        return (feats @ td).mean(axis=-1)
    return feats @ td


def fast_text_dlw(
    net, variables: Dict[str, Any], x: jax.Array, t: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(scores, W) for the text-grounded workload via the hand-scheduled
    trunk backward; scores_b = text_score_head(f(x_b), t), W = d score / d x
    (batch rows are independent, so one VJP with a ones cotangent yields the
    per-sample W stack)."""
    feats, vjp_fn = fast_encode_and_vjp(net, variables, x)
    scores, head_vjp = jax.vjp(lambda f: text_score_head(f, t), feats)
    (ct,) = head_vjp(jnp.ones_like(scores))
    return scores, vjp_fn(ct)

"""End-to-end b=2 differential for the B-cosified CLIP image tower.

Builds the reference's ACTUAL conversion pipeline — root `bcosify.py`
BcosifyNetwork over the reference CLIP `ModifiedResNet` visual with
clip_kd=True (attnpool -> BcosAttentionPool2d, c_proj -> BcosifyLinear,
q/k/v kept plain, biases + positional_embedding nulled, per
`/root/reference/bcos/experiments/ImageNet/clip_bcosification/model.py:8-25`)
— maps the POST-conversion torch state into this framework's bcosified
ModifiedResNet, and asserts explain-mode features and the text-grounded
W(x) (`/root/reference/interpretability/analyses/text_localisation.py`
semantics: score = f(x) . t, one backward) match end-to-end, for both the
pooled and attn_unpool heads, through BOTH the generic autodiff route and
explain/fast_clip.py.

The post-conversion state is mapped directly (not through
bcosify/clip_import.py) because the reference's pooled
`BcosAttentionPool2d.from_standard_module` random-inits q/k/v/c
(bcosattnpool.py:62-77 copies only under attn_unpool) — conversion-time
weight parity is covered separately by tests/test_clip_parity.py's b=1
oracle. This test closes the composed SEMANTICS seam: stem/bottleneck
detaches + anti-aliased pooling + attnpool q/k detach + c_proj scale detach
+ unpool L2 norm detach, all at once.
"""
import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reference_loader import (  # noqa: E402
    REFERENCE,
    load_reference_bcosify,
    reference_available,
)

from bcosification_tpu.bcosify import params as P  # noqa: E402
from bcosification_tpu.bcosify.clip_import import build_bcosified_clip_visual  # noqa: E402
from bcosification_tpu.explain import fast_clip  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

WIDTH = 16
RES = 64
OUT_DIM = 32
HEADS = WIDTH * 32 // 64
TINY_CFG = {
    "vision_layers": (1, 1, 1, 1),
    "vision_width": WIDTH,
    "embed_dim": OUT_DIM,
    "image_resolution": RES,
}


def _ref_visual():
    # must come from the same module object bcosify.py imports, or its
    # `isinstance(module, AttentionPool2d)` dispatch (bcosify.py:80) misses
    load_reference_bcosify()
    import importlib as _il

    mod = _il.import_module("CLIP.clip.model")
    return mod.ModifiedResNet(
        layers=[1, 1, 1, 1], output_dim=OUT_DIM, heads=HEADS,
        input_resolution=RES, width=WIDTH,
    ).float()


def _randomize(model, rng, gamma_mult):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.num_features).astype(np.float32) * 0.3))
                m.running_var.copy_(torch.from_numpy(
                    (rng.random(m.num_features) + 0.5).astype(np.float32)))
                m.weight.copy_(torch.from_numpy(
                    (rng.random(m.num_features) + 0.5).astype(np.float32)
                    * gamma_mult))
                m.bias.copy_(torch.from_numpy(
                    rng.standard_normal(m.num_features).astype(np.float32)))


def _model_config(attn_unpool):
    return {
        "weights": "RANDOM_TEST",
        "bcosify_args": {
            "fix_b": True, "use_bias": False, "norm_layer": "BnUncV2",
            "gap": True, "act_layer": True, "clip_kd": True,
        },
        "bcos_args": {"b": 2},
        "attn_unpool": attn_unpool,
        "is_bcos": True,
    }


def _build_ref(attn_unpool, gamma_mult):
    rng = np.random.default_rng(42)
    torch.manual_seed(1)
    visual = _ref_visual()
    _randomize(visual, rng, gamma_mult)
    ref_bcosify = load_reference_bcosify()
    ref = ref_bcosify.BcosifyNetwork(
        visual, _model_config(attn_unpool), add_channels=True, logit_layer=False
    )
    # the clip factory's nulling pass (clip_bcosification/model.py:17-24)
    for mod in ref.modules():
        if hasattr(mod, "bias") and mod.bias is not None:
            mod.bias = None
        if getattr(mod, "positional_embedding", None) is not None:
            mod.positional_embedding = None
    return ref.eval()


def _fill_from_ref(net, variables, ref):
    """Map the reference's POST-conversion state_dict into the flax tree."""
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def leaf(path, abstract):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        coll, scope = keys[0], keys[2:]
        name = scope[-1]
        if coll == "batch_stats":
            if name == "num_batches_tracked":
                return jnp.zeros(abstract.shape, abstract.dtype)
            tp = "model." + ".".join(_tscope(scope[:-1])) + f".{name}"
            return jnp.asarray(sd[tp])
        tp = "model." + ".".join(_tscope(scope[:-1]))
        if "proj" in scope[-2]:  # attnpool linears: torch [out,in] -> (in,out)
            suffix = ".linear.weight" if scope[-2] == "c_proj" else ".weight"
            return jnp.asarray(sd[tp + suffix].T)
        return jnp.asarray(P.torch_conv_weight(sd[tp + ".linear.weight"]))

    def _tscope(scope):
        out = []
        for s in scope:
            if s.startswith("layer") and "_" in s:
                stage, j = s.split("_")
                out += [stage, j]
            elif s == "downsample_conv":
                out += ["downsample", "1"]  # CLIP ds: 0=avgpool, 1=conv, 2=bn
            elif s == "downsample_norm":
                out += ["downsample", "2"]
            else:
                out.append(s)
        return out

    def fill(path, abstract):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys[-1] == "weight" and keys[-2].startswith("bn"):
            tp = "model." + ".".join(_tscope(keys[2:-1])) + ".weight"
            return jnp.asarray(sd[tp])
        if keys[-2] in ("downsample_norm",) and keys[-1] == "weight":
            tp = "model." + ".".join(_tscope(keys[2:-1])) + ".weight"
            return jnp.asarray(sd[tp])
        return leaf(path, abstract)

    return jax.tree_util.tree_map_with_path(fill, variables)


def _calibrated(attn_unpool):
    probe = np.random.default_rng(99).random((1, 6, RES, RES)).astype(np.float32)
    for gamma_mult in (1.0, 4.0, 16.0, 64.0, 256.0):
        ref = _build_ref(attn_unpool, gamma_mult)
        with torch.no_grad():
            out = ref(torch.from_numpy(probe))
        mag = float(out.abs().max())
        if 1e-2 < mag < 1e3:
            return ref
    raise AssertionError(f"calibration failed (magnitude {mag})")


@pytest.fixture(scope="module", params=[False, True], ids=["pooled", "unpool"])
def clip_oracle(request):
    attn_unpool = request.param
    ref = _calibrated(attn_unpool)
    net, variables = build_bcosified_clip_visual(
        _model_config(attn_unpool), None, dict(TINY_CFG)
    )
    variables = _fill_from_ref(net, variables, ref)
    rng = np.random.default_rng(3)
    x = rng.random((2, 3, RES, RES)).astype(np.float32)
    x6 = np.concatenate([x, 1.0 - x], axis=1)
    return ref, net, variables, x6, attn_unpool


def _ref_forward(ref, x6_t, explain):
    if not explain:
        with torch.no_grad():
            return ref(x6_t)
    with torch.no_grad(), ref.explanation_mode():
        return ref(x6_t)


def test_clip_b2_features_match(clip_oracle):
    ref, net, variables, x6, attn_unpool = clip_oracle
    x6_t = torch.from_numpy(x6)
    want = _ref_forward(ref, x6_t, explain=False).numpy()
    if attn_unpool:
        want = want.transpose(1, 0, 2)  # ref unpool is (HW, N, D); ours [N, HW, D]
    got = np.asarray(
        net.apply(variables, jnp.asarray(x6.transpose(0, 2, 3, 1)), train=False)
    )
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * scale)
    # explain-mode values must be identical too (the values-invariant)
    want_e = _ref_forward(ref, x6_t, explain=True).numpy()
    if attn_unpool:
        want_e = want_e.transpose(1, 0, 2)
    got_e = np.asarray(
        net.apply(
            variables, jnp.asarray(x6.transpose(0, 2, 3, 1)), train=False, explain=True
        )
    )
    np.testing.assert_allclose(got_e, want_e, rtol=1e-4, atol=1e-5 * scale)


def test_clip_b2_text_grounded_W_matches(clip_oracle):
    ref, net, variables, x6, attn_unpool = clip_oracle
    rng = np.random.default_rng(5)
    t_np = rng.standard_normal(OUT_DIM).astype(np.float32)
    t_np /= np.linalg.norm(t_np)

    xt = torch.from_numpy(x6).clone().requires_grad_(True)
    with torch.enable_grad(), ref.explanation_mode():
        out = ref(xt)
        score_t = (out * torch.from_numpy(t_np)).sum()
        score_t.backward()
    t_W = xt.grad.numpy().transpose(0, 2, 3, 1)

    x6_j = jnp.asarray(x6.transpose(0, 2, 3, 1))
    t_j = jnp.asarray(t_np)

    # generic autodiff route
    def score_fn(inp):
        feats = net.apply(variables, inp, train=False, explain=True)
        return (feats @ t_j).sum()

    s_auto, w_auto = jax.value_and_grad(score_fn)(x6_j)

    # hand-scheduled route (sum over all positions for unpool = t ct everywhere)
    feats, vjp_fn = fast_clip.fast_encode_and_vjp(net, variables, x6_j)
    ct = jnp.broadcast_to(t_j, feats.shape)
    w_fast = vjp_fn(ct)

    scale = max(np.abs(t_W).max(), 1e-6)
    np.testing.assert_allclose(float(s_auto), float(score_t), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(w_auto), t_W, rtol=1e-4, atol=1e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(w_fast), t_W, rtol=1e-4, atol=1e-5 * scale
    )

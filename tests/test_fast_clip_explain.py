"""Fast CLIP explain pass vs generic autodiff: values exact, W to rounding.

Model: build_bcosified_clip_visual on a miniature ModifiedResNet config —
same composition as the production RN50 tower (3-conv stem, anti-aliased
bottlenecks, BcosAttentionPool2d pooled/unpool), ref
`/root/reference/CLIP/clip/model.py:94-155` + `/root/reference/bcos/modules/
bcosattnpool.py`.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.bcosify.clip_import import build_bcosified_clip_visual
from bcosification_tpu.explain import fast_clip

TINY_CFG = {
    "vision_layers": (1, 1, 1, 1),
    "vision_width": 16,
    "embed_dim": 32,
    "image_resolution": 32,
}


def _build(attn_unpool: bool):
    model_config = {
        "name": "resnet50clip",
        "bcosify_args": {"clip_kd": True, "use_bias": False},
        "bcos_args": {"b": 2},
        "attn_unpool": attn_unpool,
    }
    net, variables = build_bcosified_clip_visual(model_config, None, dict(TINY_CFG))
    # flax init of the bcosified tower is degenerate (outputs exactly 0 in
    # eval mode — weights contract); randomise params + stats so every
    # activation, scale and mask carries real signal for the differential
    rng = np.random.default_rng(7)

    def rand_params(leaf):
        return jnp.asarray(rng.standard_normal(leaf.shape).astype(np.float32) * 0.5)

    def rand_stats(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name == "running_var":
            return jnp.asarray((rng.random(leaf.shape) + 0.5).astype(np.float32))
        if name == "running_mean":
            return jnp.asarray(rng.standard_normal(leaf.shape).astype(np.float32) * 0.3)
        return leaf

    variables = {
        "params": jax.tree_util.tree_map(rand_params, variables["params"]),
        "batch_stats": jax.tree_util.tree_map_with_path(
            rand_stats, variables["batch_stats"]
        ),
    }
    return net, variables


@pytest.fixture(scope="module", params=[False, True], ids=["pooled", "unpool"])
def clip_setup(request):
    rng = np.random.default_rng(0)
    net, variables = _build(request.param)
    x = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))
    return net, variables, x


def test_supports(clip_setup):
    net, variables, x = clip_setup
    assert fast_clip.supports(net)
    # guard against the degenerate-init trap: the differential below is only
    # meaningful if the tower produces real signal
    feats = net.apply(variables, x, train=False, explain=True)
    assert float(jnp.abs(feats).max()) > 1e-3


def test_values_exact(clip_setup):
    net, variables, x = clip_setup
    want = np.asarray(net.apply(variables, x, train=False, explain=True))
    got, _ = fast_clip.fast_encode_and_vjp(net, variables, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


def test_W_matches_autodiff(clip_setup, rng):
    net, variables, x = clip_setup
    feats0 = net.apply(variables, x, train=False, explain=True)
    d = feats0.shape[-1]
    t = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    t = t / jnp.linalg.norm(t)

    def score(inp):
        # the reference text-grounded head (text_localisation.py:77-100):
        # differentiable per-location cosine, mean over locations
        feats = net.apply(variables, inp, train=False, explain=True)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        if feats.ndim == 3:
            return (feats @ t).mean(axis=-1).sum()
        return (feats @ t).sum()

    s_ref, w_ref = jax.value_and_grad(score)(x)

    @jax.jit
    def fast(v, inp):
        return fast_clip.fast_text_dlw(net, v, inp, t)

    scores, w = fast(variables, x)
    np.testing.assert_allclose(
        float(scores.sum()), float(s_ref), rtol=1e-5, atol=1e-6
    )
    scale = float(jnp.abs(w_ref).max())
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(w_ref), rtol=1e-4, atol=1e-5 * max(scale, 1.0)
    )


def test_text_localisation_routes_fast(clip_setup, rng, monkeypatch):
    """compute_attributions picks the fast pass for supported CLIP towers and
    produces the same W as the generic autodiff route."""
    from bcosification_tpu.explain import fast_clip as fc
    from bcosification_tpu.interpretability.analyses.text_localisation import (
        compute_attributions,
    )

    net, variables, x = clip_setup
    feats0 = net.apply(variables, x, train=False, explain=True)
    emb = jnp.asarray(rng.standard_normal(feats0.shape[-1]).astype(np.float32))
    emb = emb / jnp.linalg.norm(emb)
    img = x[:1]

    calls = {"fast": 0}
    orig = fc.fast_encode_and_vjp

    def counting(*a, **k):
        calls["fast"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(fc, "fast_encode_and_vjp", counting)
    res_fast = compute_attributions(net, variables, emb, img)
    assert calls["fast"] == 1

    monkeypatch.setattr(fc, "supports", lambda m: False)
    res_ref = compute_attributions(net, variables, emb, img)
    np.testing.assert_allclose(res_fast["score"], res_ref["score"], rtol=1e-5)
    w_f = np.asarray(res_fast["dynamic_linear_weights"])
    w_r = np.asarray(res_ref["dynamic_linear_weights"])
    scale = max(np.abs(w_r).max(), 1e-6)
    np.testing.assert_allclose(w_f, w_r, rtol=1e-4, atol=1e-5 * scale)


def test_nonexplain_differs(clip_setup, rng):
    """Sanity: the pass computes the EXPLAIN-variant gradient (stop-gradient
    placements), which differs from the train-mode gradient."""
    net, variables, x = clip_setup
    feats0 = net.apply(variables, x, train=False, explain=True)
    d = feats0.shape[-1]
    t = jnp.asarray(rng.standard_normal(d).astype(np.float32))

    def score_train(inp):
        feats = net.apply(variables, inp, train=False, explain=False)
        if feats.ndim == 3:
            feats = feats.mean(axis=1)
        return (feats @ t).sum()

    w_train = jax.grad(score_train)(x)
    _, w_fast = fast_clip.fast_text_dlw(net, variables, x, t)
    assert float(jnp.abs(w_train - w_fast).max()) > 1e-6

"""The hand-scheduled explain pass and the segment custom-VJP must agree with
the generic autodiff explain path exactly (values) / to rounding (gradients).

These are the two structural variants of the explanation backward measured in
docs/PERF.md; whichever is active, explanations must not change.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny(arch, layers):
    from __graft_entry__ import _flagship

    return _flagship(
        input_size=64, arch=arch, inplanes=8, num_classes=10, layers=layers
    )


def _autodiff(net, variables, x):
    from bcosification_tpu.explain.core import dynamic_linear_weights

    def f(inp):
        return net.apply(variables, inp, train=False, explain=True)

    return dynamic_linear_weights(f, x)


@pytest.mark.parametrize(
    "arch,layers",
    [("resnet50", ("bottleneck", (1, 1))), ("resnet18", ("basic", (1, 1)))],
)
def test_fast_explain_matches_autodiff(arch, layers):
    from bcosification_tpu.explain import fast_resnet

    net, variables = _tiny(arch, layers)
    assert fast_resnet.supports(net)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 64, 64, 6)).astype(np.float32)
    )
    l0, s0, w0 = _autodiff(net, variables, x)
    l1, s1, w1 = fast_resnet.fast_dynamic_linear_weights(net, variables, x)
    # values follow the module path op-for-op -> identical
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    # W: scale reconstruction differs by fp rounding only
    w0, w1 = np.asarray(w0), np.asarray(w1)
    assert np.linalg.norm(w0 - w1) <= 1e-5 * np.linalg.norm(w0)


def test_fast_explain_fixed_class_index():
    from bcosification_tpu.explain import fast_resnet

    net, variables = _tiny("resnet50", ("bottleneck", (1, 1)))
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 64, 64, 6)).astype(np.float32)
    )
    idx = jnp.asarray(3)
    l0, s0, w0 = _autodiff(net, variables, x)  # warm path exists
    from bcosification_tpu.explain.core import dynamic_linear_weights

    def f(inp):
        return net.apply(variables, inp, train=False, explain=True)

    l0, s0, w0 = dynamic_linear_weights(f, x, idx)
    l1, s1, w1 = fast_resnet.fast_dynamic_linear_weights(net, variables, x, idx)
    assert (np.asarray(s1) == 3).all()
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    assert np.linalg.norm(np.asarray(w0 - w1)) <= 1e-5 * np.linalg.norm(
        np.asarray(w0)
    )


def test_fast_explain_rejects_unsupported():
    from bcosification_tpu.explain import fast_resnet
    from bcosification_tpu.models import resnet as resnet_lib

    net = resnet_lib.resnet18(num_classes=10)  # from-scratch B-cos variant:
    # PositionNorm (not running-var BN) and built-in logit layer
    assert not fast_resnet.supports(net)


def test_segment_vjp_matches_autodiff(monkeypatch):
    net, variables = _tiny("resnet50", ("bottleneck", (1, 1)))
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 64, 64, 6)).astype(np.float32)
    )
    monkeypatch.setenv("BCOS_EXPLAIN_SEGMENT", "0")
    l0, s0, w0 = _autodiff(net, variables, x)
    monkeypatch.setenv("BCOS_EXPLAIN_SEGMENT", "1")
    l1, s1, w1 = _autodiff(net, variables, x)
    # the folded-affine fold computes y*(gamma/std) vs the module's
    # (y/std)*gamma — same value up to one rounding step
    np.testing.assert_allclose(
        np.asarray(l0), np.asarray(l1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    w0, w1 = np.asarray(w0), np.asarray(w1)
    assert np.linalg.norm(w0 - w1) <= 1e-5 * np.linalg.norm(w0)


def test_segment_vjp_guided_backprop_unaffected(monkeypatch):
    """GuidedBackprop must keep its gated-ReLU gradients even when the
    segment fast path is enabled (the segment gate defers to guided mode)."""
    from bcosification_tpu.ops import guided

    net, variables = _tiny("resnet50", ("bottleneck", (1, 1)))
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 64, 64, 6)).astype(np.float32)
    )

    def gb(inp):
        with guided.guided_backprop():
            def f(t):
                return net.apply(variables, t, train=False, explain=True)

            out, vjp = jax.vjp(f, inp)
            sel = jnp.argmax(out, axis=1)
            (g,) = vjp(jax.nn.one_hot(sel, out.shape[-1], dtype=out.dtype))
            return g

    monkeypatch.setenv("BCOS_EXPLAIN_SEGMENT", "0")
    g0 = np.asarray(gb(x))
    monkeypatch.setenv("BCOS_EXPLAIN_SEGMENT", "1")
    g1 = np.asarray(gb(x))
    assert np.linalg.norm(g0 - g1) <= 1e-5 * max(np.linalg.norm(g0), 1e-30)


def test_make_explain_fn_fast_dispatch():
    """make_explain_fn(fast='auto') routes supported models through the
    hand-scheduled pass with outputs matching the generic path."""
    from bcosification_tpu.explain.core import make_explain_fn

    net, variables = _tiny("resnet50", ("bottleneck", (1, 1)))
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 64, 64, 6)).astype(np.float32)
    )
    auto = make_explain_fn(net, with_image=False)(variables, x)
    slow = make_explain_fn(net, with_image=False, fast=False)(variables, x)
    np.testing.assert_array_equal(
        np.asarray(auto["prediction"]), np.asarray(slow["prediction"])
    )
    w0 = np.asarray(slow["dynamic_linear_weights"])
    w1 = np.asarray(auto["dynamic_linear_weights"])
    assert np.linalg.norm(w0 - w1) <= 1e-5 * np.linalg.norm(w0)
    np.testing.assert_allclose(
        np.asarray(auto["contribution_map"]),
        np.asarray(slow["contribution_map"]),
        rtol=1e-4, atol=1e-7,
    )


def test_explain_cache_bounded(monkeypatch):
    """The per-model compiled-explain cache is a bounded LRU: a sweep that
    builds one model per checkpoint must not accumulate executables (and
    their pinned models) for the process lifetime (r5 review)."""
    from bcosification_tpu.explain import core as explain_core

    monkeypatch.setattr(explain_core, "_EXPLAIN_CACHE_SIZE", 2)
    explain_core._EXPLAIN_CACHE.clear()
    nets = [_tiny("resnet50", ("bottleneck", (1, 1))) for _ in range(3)]
    for net, _ in nets:
        explain_core.make_explain_fn(net, with_image=False)
    assert len(explain_core._EXPLAIN_CACHE) == 2
    # the surviving entries are the two most recent models
    live_ids = {k[0] for k in explain_core._EXPLAIN_CACHE}
    assert live_ids == {id(nets[1][0]), id(nets[2][0])}
    explain_core._EXPLAIN_CACHE.clear()

    # size 0 = "no caching" must still return a working fn, not KeyError
    # (r5 review: the eviction loop used to pop the just-inserted entry
    # before the lookup)
    monkeypatch.setattr(explain_core, "_EXPLAIN_CACHE_SIZE", 0)
    fn = explain_core.make_explain_fn(nets[0][0], with_image=False)
    assert callable(fn)
    assert len(explain_core._EXPLAIN_CACHE) == 0


def test_fast_explain_bf16_tolerance():
    """The TPU bench runs this path in bf16; check the scale reconstruction
    (incl. the out-minus-identity cancellation) stays within bf16 rounding
    of the autodiff path on the same dtype."""
    net, variables = _tiny("resnet50", ("bottleneck", (1, 1)))
    from bcosification_tpu.explain import fast_resnet

    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 64, 64, 6)).astype(np.float32)
    ).astype(jnp.bfloat16)
    l0, s0, w0 = _autodiff(net, variables, x)
    l1, s1, w1 = fast_resnet.fast_dynamic_linear_weights(net, variables, x)
    np.testing.assert_array_equal(
        np.asarray(l0, np.float32), np.asarray(l1, np.float32)
    )
    w0 = np.asarray(w0, np.float32)
    w1 = np.asarray(w1, np.float32)
    # bf16 has ~3 decimal digits; the reconstruction compounds a few ulps
    assert np.linalg.norm(w0 - w1) <= 3e-2 * np.linalg.norm(w0), (
        np.linalg.norm(w0 - w1) / np.linalg.norm(w0)
    )


def test_segment_vjp_deeplift_unaffected(monkeypatch):
    """DeepLIFT's rescale ReLU multipliers must survive BCOS_EXPLAIN_SEGMENT=1
    (the segment/layer VJPs hard-code the plain mask; the gates defer)."""
    from bcosification_tpu.interpretability.explanation_methods import (
        get_explainer,
    )

    net, variables = _tiny("resnet50", ("bottleneck", (1, 1)))
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 64, 64, 6)).astype(np.float32)
    )
    baseline = jnp.full_like(x, 0.25)

    def attr():
        dl = get_explainer(
            net, variables, "DeepLIFT", baseline=baseline,
            explanation_mode=True,
        )
        return np.asarray(dl.attribute_selection(x, jnp.asarray([2])))

    monkeypatch.setenv("BCOS_EXPLAIN_SEGMENT", "0")
    a0 = attr()
    monkeypatch.setenv("BCOS_EXPLAIN_SEGMENT", "1")
    a1 = attr()
    assert np.linalg.norm(a0 - a1) <= 1e-5 * max(np.linalg.norm(a0), 1e-30)


@pytest.mark.parametrize(
    "arch,layers",
    [("resnet50", ("bottleneck", (1, 1))), ("resnet18", ("basic", (1, 1)))],
)
def test_aug_norm_matches_autodiff(arch, layers, monkeypatch):
    """BCOS_AUG_NORM=1 folds every patch norm into its own conv call (one
    augmented conv_general_dilated per layer instead of conv+reduce_window);
    the summands are identical up to reassociation, so logits and W must
    match the autodiff path at the usual fp32 rounding tolerance."""
    from bcosification_tpu.explain import fast_resnet

    net, variables = _tiny(arch, layers)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(3, 64, 64, 6)).astype(np.float32)
    )
    l0, s0, w0 = _autodiff(net, variables, x)
    monkeypatch.setenv("BCOS_AUG_NORM", "1")
    l1, s1, w1 = fast_resnet.fast_dynamic_linear_weights(net, variables, x)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_allclose(
        np.asarray(l0), np.asarray(l1), rtol=1e-5, atol=1e-6
    )
    w0, w1 = np.asarray(w0), np.asarray(w1)
    assert np.linalg.norm(w0 - w1) <= 1e-5 * np.linalg.norm(w0)


def test_aug_norm_bf16_tolerance(monkeypatch):
    """In bf16 the augmented path rounds the sumsq channel to bf16 (the
    default path keeps it fp32): the perturbation is ~2^-9 relative on the
    norm, which must stay inside the same bf16 bound the fast pass itself
    carries vs autodiff."""
    from bcosification_tpu.explain import fast_resnet

    net, variables = _tiny("resnet50", ("bottleneck", (1, 1)))
    x = jnp.asarray(
        np.random.default_rng(13).normal(size=(2, 64, 64, 6)).astype(np.float32)
    ).astype(jnp.bfloat16)
    l0, s0, w0 = _autodiff(net, variables, x)
    monkeypatch.setenv("BCOS_AUG_NORM", "1")
    l1, s1, w1 = fast_resnet.fast_dynamic_linear_weights(net, variables, x)
    l0 = np.asarray(l0, np.float32)
    l1 = np.asarray(l1, np.float32)
    assert np.linalg.norm(l0 - l1) <= 3e-2 * max(np.linalg.norm(l0), 1e-30)
    w0 = np.asarray(w0, np.float32)
    w1 = np.asarray(w1, np.float32)
    assert np.linalg.norm(w0 - w1) <= 3e-2 * np.linalg.norm(w0)

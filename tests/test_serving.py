"""Serving export round-trip: export -> serialize -> deserialize -> call
must reproduce the live model, including the fused explain step, at any
batch size (batch is exported symbolically)."""
import numpy as np

import jax
import jax.numpy as jnp


def _tiny():
    from __graft_entry__ import _flagship

    return _flagship(
        input_size=32, arch="resnet50", inplanes=8, num_classes=10,
        layers=("bottleneck", (1, 1)),
    )


def test_export_forward_roundtrip():
    from bcosification_tpu import serving

    net, variables = _tiny()
    blob = serving.export_forward(net, variables, input_size=32)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    fn = serving.load_serialized(blob)
    for batch in (1, 3):
        x = jnp.asarray(
            np.random.default_rng(batch).normal(size=(batch, 32, 32, 6))
        ).astype(jnp.float32)
        got = np.asarray(fn.call(x))
        want = np.asarray(net.apply(variables, x, train=False))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_explain_roundtrip():
    from bcosification_tpu import serving
    from bcosification_tpu.explain import fast_resnet
    from bcosification_tpu.explain.core import dynamic_linear_weights

    net, variables = _tiny()
    assert fast_resnet.supports(net)  # exports the hand-scheduled pass
    blob = serving.export_explain(net, variables, input_size=32)
    fn = serving.load_serialized(blob)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 6))
    ).astype(jnp.float32)
    logits, sel, w = fn.call(x)

    def f(inp):
        return net.apply(variables, inp, train=False, explain=True)

    l0, s0, w0 = dynamic_linear_weights(f, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(l0), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(s0))
    w, w0 = np.asarray(w), np.asarray(w0)
    assert np.linalg.norm(w - w0) <= 1e-5 * np.linalg.norm(w0)


def test_export_text_explain_roundtrip():
    """Text-grounded CLIP explain export: (x, t) -> (scores, W) reproduces
    the live fast_clip pass at any batch size."""
    from test_fast_clip_explain import TINY_CFG, _build

    from bcosification_tpu import serving
    from bcosification_tpu.explain import fast_clip

    net, variables = _build(False)
    assert fast_clip.supports(net)
    blob = serving.export_text_explain(
        net, variables, embed_dim=TINY_CFG["embed_dim"], input_size=32
    )
    fn = serving.load_serialized(blob)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal(TINY_CFG["embed_dim"]).astype(np.float32))
    t = t / jnp.linalg.norm(t)
    for batch in (1, 2):
        x = jnp.asarray(rng.random((batch, 32, 32, 6)).astype(np.float32))
        scores, w = fn.call(x, t)
        want_scores, want_w = fast_clip.fast_text_dlw(net, variables, x, t)
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(want_scores), rtol=1e-4, atol=1e-5
        )
        # the exported program is re-lowered (symbolic batch) -> fp
        # reassociation vs the live jit; 1e-4-scale noise is expected
        scale = float(np.abs(np.asarray(want_w)).max())
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(want_w), rtol=1e-3, atol=1e-4 * max(scale, 1e-3)
        )

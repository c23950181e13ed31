"""Serving export: package a model (forward and/or fwd+explain) as a
portable StableHLO artifact via ``jax.export``.

The reference has no serving story (research checkpoints only); for
production deployment the compiled functions are the product: an exported
artifact embeds the weights, runs on any device kind it was lowered for,
and needs no Python model code at load time — `deserialize` + `.call` is
the whole runtime contract.

Batch is exported as a symbolic dimension, so one artifact serves any batch
size.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_forward", "export_explain", "export_text_explain", "load_serialized"]


def _input_spec(input_size: int, channels: int, dtype) -> jax.ShapeDtypeStruct:
    (batch,) = jax_export.symbolic_shape("batch")
    return jax.ShapeDtypeStruct((batch, input_size, input_size, channels), dtype)


def export_forward(
    net,
    variables,
    *,
    input_size: int = 224,
    channels: int = 6,
    dtype=jnp.float32,
    platforms: Optional[Tuple[str, ...]] = None,
) -> bytes:
    """Serialized StableHLO of ``net.apply(variables, x, train=False)`` with
    the weights baked in. x: [batch?, S, S, C]."""

    def fwd(x):
        return net.apply(variables, x, train=False)

    exp = jax_export.export(
        jax.jit(fwd), platforms=platforms
    )(_input_spec(input_size, channels, dtype))
    return exp.serialize()


def export_explain(
    net,
    variables,
    *,
    input_size: int = 224,
    channels: int = 6,
    dtype=jnp.float32,
    platforms: Optional[Tuple[str, ...]] = None,
) -> bytes:
    """Serialized StableHLO of the fused fwd+explain step: returns
    (logits, selected_idx, W) — the dynamic-linear weights W(x) alongside
    the prediction, one program. Uses the hand-scheduled fast pass when the
    model qualifies (explain/fast_resnet.py), the generic fused VJP
    otherwise."""
    from bcosification_tpu.explain import fast_resnet
    from bcosification_tpu.explain.core import dynamic_linear_weights

    use_fast = fast_resnet.supports(net)

    def step(x):
        if use_fast:
            return fast_resnet.fast_dynamic_linear_weights(net, variables, x)

        def f(inp):
            return net.apply(variables, inp, train=False, explain=True)

        return dynamic_linear_weights(f, x)

    exp = jax_export.export(
        jax.jit(step), platforms=platforms
    )(_input_spec(input_size, channels, dtype))
    return exp.serialize()


def export_text_explain(
    net,
    variables,
    *,
    embed_dim: int,
    input_size: int = 224,
    channels: int = 6,
    dtype=jnp.float32,
    platforms: Optional[Tuple[str, ...]] = None,
) -> bytes:
    """Serialized StableHLO of the text-grounded explain step for a CLIP
    image tower: (x [batch?, S, S, C], t [D]) -> (scores [batch?], W like x)
    with score_b the reference's cosine score (text_localisation.py:77-100,
    pool_cosine=1; see explain/fast_clip.text_score_head) in explanation
    mode. Routes through the hand-scheduled pass (explain/fast_clip.py) when
    the tower qualifies."""
    from bcosification_tpu.explain import fast_clip

    use_fast = fast_clip.supports(net)

    def step(x, t):
        if use_fast:
            return fast_clip.fast_text_dlw(net, variables, x, t)

        def score(inp):
            feats = net.apply(variables, inp, train=False, explain=True)
            scores = fast_clip.text_score_head(feats, t)
            return scores.sum(), scores

        (_, scores), w = jax.value_and_grad(score, has_aux=True)(x)
        return scores, w

    t_spec = jax.ShapeDtypeStruct((embed_dim,), dtype)
    exp = jax_export.export(
        jax.jit(step), platforms=platforms
    )(_input_spec(input_size, channels, dtype), t_spec)
    return exp.serialize()


def load_serialized(blob: bytes):
    """Rehydrate an exported artifact; returns an object whose ``.call(x)``
    runs the program on the current backend."""
    return jax_export.deserialize(blob)

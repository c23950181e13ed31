"""Attention pooling heads for the CLIP image tower.

- `AttentionPool2d`: the standard CLIP head (positional embedding + mean-token
  query QKV attention, `/root/reference/CLIP/clip/model.py:58-92`), used by the
  frozen teacher.
- `BcosAttentionPool2d`: the B-cosified head
  (`/root/reference/bcos/modules/bcosattnpool.py`): positional embedding
  dropped, q/k projections stay plain Linears (bcosify.py:95 keeps q/k/v plain;
  the reference's BcosAttentionPool2d detaches q and k in explanation mode),
  c_proj is bcosified by the conversion; ``attn_unpool`` skips attention
  entirely -> per-location v_proj∘c_proj + L2-normalise with outputs
  [N, HW, D] (basis for text localisation).

Layout: input NHWC feature map; sequence-major internally (tokens on the
second-to-last axis).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.models.vit import PlainLinear

__all__ = ["AttentionPool2d", "BcosAttentionPool2d"]


def _mha(q, k, v, num_heads: int):
    """Multi-head attention core on [B, N, D] tensors (post-projection)."""
    b, nq, d = q.shape
    nk = k.shape[1]
    dh = d // num_heads

    def split(t, n):
        return t.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, nq), split(k, nk), split(v, v.shape[1])
    attn = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / jnp.sqrt(dh).astype(q.dtype), axis=-1
    )
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)


class AttentionPool2d(nn.Module):
    """Standard CLIP attention pool (CLIP/clip/model.py:58-92)."""

    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    spacial_dim: int = 7

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (self.spacial_dim**2 + 1, self.embed_dim),
        )
        seq = seq + pos[None].astype(seq.dtype)
        q = PlainLinear(self.embed_dim, name="q_proj")(seq[:, :1])
        k = PlainLinear(self.embed_dim, name="k_proj")(seq)
        v = PlainLinear(self.embed_dim, name="v_proj")(seq)
        out = _mha(q, k, v, self.num_heads)
        out = PlainLinear(self.output_dim or self.embed_dim, name="c_proj")(out)
        return out[:, 0]


class BcosAttentionPool2d(nn.Module):
    """B-cosified attention pool (bcosattnpool.py:10-59)."""

    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    attn_unpool: bool = False
    linear_layer: Callable = PlainLinear  # for v_proj (stays plain)
    c_proj_layer: Callable = PlainLinear  # bcosified by the conversion

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)

        if self.attn_unpool:
            # per-location features, L2-normalised (bcosattnpool.py:23-32)
            out = self.linear_layer(self.embed_dim, name="v_proj")(seq, **f)
            out = self.c_proj_layer(self.output_dim or self.embed_dim, name="c_proj")(
                out, **f
            )
            norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
            if explain:
                norm = jax.lax.stop_gradient(norm)
            return out / norm  # [B, HW, D]

        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        # NOTE: no positional embedding (dropped by the bcosification)
        q_in = seq[:, :1]
        k_in = seq
        if explain:
            q_in = jax.lax.stop_gradient(q_in)
            k_in = jax.lax.stop_gradient(k_in)
        # REFERENCE SEMANTICS (bcosattnpool.py:40-59): the pooled path runs
        # F.multi_head_attention_forward with in_proj_bias=None and
        # out_proj_weight=self.c_proj.weight — i.e. every projection is
        # WEIGHT-ONLY, and c_proj's B-cos dynamic scale is bypassed (only the
        # unpool path calls the c_proj module). Replicated exactly here;
        # asserted end-to-end in tests/test_e2e_clip_b2_oracle.py.
        q = self.linear_layer(self.embed_dim, name="q_proj")(
            q_in, weight_only=True, **f
        )
        k = self.linear_layer(self.embed_dim, name="k_proj")(
            k_in, weight_only=True, **f
        )
        v = self.linear_layer(self.embed_dim, name="v_proj")(
            seq, weight_only=True, **f
        )
        out = _mha(q, k, v, self.num_heads)
        out = self.c_proj_layer(
            self.output_dim or self.embed_dim, name="c_proj"
        )(out, weight_only=True, **f)
        return out[:, 0]

"""Greedy caption decoder — the in-framework generative micro-model.

The reference's captioning task (`/root/reference/CLIP_benchmark/
clip_benchmark/metrics/captioning.py:1-99`) assumes an external CoCa model
from open_clip with ``.generate()``. This framework ships a minimal but REAL
autoregressive captioner so `--task captioning` is exercisable end-to-end
without external weights: a trainable head that predicts the next token from
(image feature, previous token), decoded greedily under `lax.scan`.

This is deliberately tiny — a linear/tanh head, not a language model — but it
is a genuine generative path: teacher-forcing training (`caption_loss`),
autoregressive greedy decode (`greedy_generate`), BPE detokenisation.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "GreedyCaptioner",
    "greedy_generate",
    "caption_loss",
    "make_caption_train_step",
    "decode_tokens",
]

# CLIP BPE special token ids (clip/tokenizer.py vocab layout)
CLIP_BOS = 49406
CLIP_EOS = 49407


class GreedyCaptioner(nn.Module):
    """Next-token head: logits = Dense(tanh(img_proj(feat) + tok_emb(prev)))."""

    vocab_size: int
    hidden: int = 64
    bos: int = CLIP_BOS
    eos: int = CLIP_EOS
    max_len: int = 16

    def setup(self):
        self.tok_emb = nn.Embed(self.vocab_size, self.hidden, name="tok_emb")
        self.img_proj = nn.Dense(self.hidden, name="img_proj")
        self.head = nn.Dense(self.vocab_size, name="head")

    def __call__(self, features: jax.Array, prev_tokens: jax.Array) -> jax.Array:
        """Teacher forcing: features [B, D], prev_tokens [B, L] -> [B, L, V]."""
        h = jnp.tanh(self.img_proj(features))[:, None, :] + self.tok_emb(prev_tokens)
        return self.head(jnp.tanh(h))


def greedy_generate(model: GreedyCaptioner, variables, features: jax.Array) -> jax.Array:
    """Autoregressive greedy decode: [B, D] -> token ids [B, max_len]."""

    def step(prev, _):
        logits = model.apply(variables, features, prev[:, None])[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, nxt

    init = jnp.full((features.shape[0],), model.bos, jnp.int32)
    _, toks = lax.scan(step, init, None, length=model.max_len)
    return toks.T  # [B, max_len]


def caption_loss(model, variables, features, tokens):
    """Teacher-forcing cross-entropy. tokens [B, L] starts with BOS."""
    logits = model.apply(variables, features, tokens[:, :-1])
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    not_eos = (targets != model.eos).astype(nll.dtype)
    # keep position t iff no EOS appears among targets[:, :t]: the first EOS
    # is still a target, and EVERYTHING after it is ignored regardless of the
    # padding scheme (repeated-EOS or the CLIP tokenizer's zero-padding)
    mask = jnp.concatenate(
        [jnp.ones_like(not_eos[:, :1]), jnp.cumprod(not_eos[:, :-1], axis=1)],
        axis=1,
    )
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_caption_train_step(model, tx):
    """jitted (params, opt_state, features, tokens) -> (params, opt_state, loss)."""

    @jax.jit
    def step(params, opt_state, features, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: caption_loss(model, {"params": p}, features, tokens)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def decode_tokens(
    token_ids: np.ndarray,
    eos: int = CLIP_EOS,
    detokenize: Optional[Callable[[Sequence[int]], str]] = None,
) -> List[str]:
    """Token id matrix [B, L] -> list of caption strings (strip at EOS)."""
    if detokenize is None:
        from bcosification_tpu.clip.tokenizer import _get_tokenizer

        detokenize = _get_tokenizer().decode
    out = []
    for row in np.asarray(token_ids):
        toks = []
        for t in row:
            if int(t) == eos:
                break
            toks.append(int(t))
        out.append(detokenize(toks).strip())
    return out

"""Text-grounded localisation for B-cosified CLIP models.

Parity target: `/root/reference/interpretability/analyses/
text_localisation.py:16-256`: embed a prompt-ensembled phrase with the CLIP
text tower (:58-65), run the student image tower in explanation mode, score
`logits = f(x) . t`, with attn-unpool per-location logits optionally
cosine-power pooled / argmax-masked / max-normed (:80-95), then one backward
pass for the dynamic-linear weights W(x) and the colour explanation map.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.explain.core import gradient_to_image
from bcosification_tpu.interpretability.analyses.utils import Analyser

__all__ = ["TextLocalisationAnalyser", "embed_phrase", "compute_attributions"]

DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a photo of the {}.",
    "a photo of one {}.",
)


def embed_phrase(text_model, text_vars, phrase: str, templates=DEFAULT_TEMPLATES):
    """Prompt-ensembled phrase embedding (text_localisation.py:58-65)."""
    from bcosification_tpu.clip.tokenizer import tokenize

    tokens = jnp.asarray(tokenize([t.format(phrase) for t in templates]))
    emb = text_model.apply(text_vars, tokens)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    emb = emb.mean(0)
    return emb / jnp.linalg.norm(emb)


def compute_attributions(
    student,
    student_vars,
    text_embedding,
    image,  # [1, H, W, 6] AddInverse-encoded
    *,
    pool_cosine_power: int = 0,
    argmax_mask: bool = False,
    max_norm: bool = False,
):
    """One explanation-mode forward + backward for the text-grounded heatmap
    (text_localisation.py:68-126). Returns dict with W(x), contribution map,
    and colour explanation."""

    def score_fn(x):
        feats = student.apply(student_vars, x, train=False, explain=True)
        if feats.ndim == 3:  # attn-unpool [B, HW, D]
            logits = feats @ text_embedding  # [B, HW]
            if max_norm:
                logits = logits / jax.lax.stop_gradient(
                    jnp.max(jnp.abs(logits), axis=-1, keepdims=True)
                )
            if pool_cosine_power > 0:
                w = jax.lax.stop_gradient(
                    jnp.abs(logits) ** (pool_cosine_power - 1)
                )
                logits = logits * w
            if argmax_mask:
                best = jnp.argmax(logits, axis=-1)
                mask = jax.nn.one_hot(best, logits.shape[-1], dtype=logits.dtype)
                mask = jax.lax.stop_gradient(mask)
                logits = logits * mask
            return logits.sum()
        feats = feats / jax.lax.stop_gradient(
            jnp.linalg.norm(feats, axis=-1, keepdims=True)
        )
        return (feats @ text_embedding).sum()

    score, grad = jax.value_and_grad(score_fn)(image)
    contribs = (image * grad).sum(-1)[0]
    explanation = gradient_to_image(image[0], grad[0])
    return {
        "score": float(score),
        "dynamic_linear_weights": grad,
        "contribution_map": contribs,
        "explanation": explanation,
    }


class TextLocalisationAnalyser(Analyser):
    default_config = dict(
        pool_cosine_power=0, argmax_mask=False, max_norm=False,
        templates=DEFAULT_TEMPLATES,
    )

    def __init__(self, student, student_vars, text_model, text_vars, **config):
        super().__init__(**config)
        self.student = student
        self.student_vars = student_vars
        self.text_model = text_model
        self.text_vars = text_vars

    def localise(self, image, phrase: str) -> Dict:
        emb = embed_phrase(
            self.text_model, self.text_vars, phrase, self.config["templates"]
        )
        return compute_attributions(
            self.student,
            self.student_vars,
            emb,
            image,
            pool_cosine_power=self.config["pool_cosine_power"],
            argmax_mask=self.config["argmax_mask"],
            max_norm=self.config["max_norm"],
        )

    def analysis(self):
        raise NotImplementedError("use .localise(image, phrase) directly")

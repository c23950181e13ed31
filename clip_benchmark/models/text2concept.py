"""Text2Concept: align any vision model's features to CLIP text space with a
linear map, enabling zero-shot use of non-CLIP models.

Parity target: `/root/reference/CLIP_benchmark/clip_benchmark/models/
text2concept_clip.py` + `Text2Concept/TextToConcept.py` (Moayeri et al.,
"Text2Concept"): fit W s.t. W f(x) ~ clip_img(x) on an alignment set, then
classify with CLIP text embeddings against W f(x).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["TextToConcept"]


class TextToConcept:
    def __init__(self, encode_features: Callable, clip_name: str = "RN50"):
        """encode_features(images [B,H,W,C]) -> model features."""
        self.encode_features = encode_features
        from bcosification_tpu.clip.load import load as clip_load

        (
            self.clip_visual,
            self.clip_visual_vars,
            self.text_model,
            self.text_vars,
            _,
            self.cfg,
        ) = clip_load(clip_name)
        self.W: Optional[np.ndarray] = None

    def fit_aligner(self, loader, max_batches: int = 50, ridge: float = 1e-2):
        """Least-squares W: model-feature -> CLIP-image-embedding."""
        from bcosification_tpu.data.presets import CLIP_MEAN, CLIP_STD

        enc_m = jax.jit(self.encode_features)
        enc_c = jax.jit(
            lambda v, x: self.clip_visual.apply(
                v,
                (x - jnp.asarray(CLIP_MEAN, x.dtype)) / jnp.asarray(CLIP_STD, x.dtype),
                train=False,
            )
        )
        F, G = [], []
        for i, batch in enumerate(loader):
            images = jnp.asarray(
                batch["image"] if isinstance(batch, dict) else batch[0]
            )
            f = np.asarray(enc_m(images))
            if f.ndim == 3:
                f = f.mean(axis=1)
            # CLIP tower expects raw [0,1] RGB; use the first 3 channels
            g = np.asarray(enc_c(self.clip_visual_vars, images[..., :3]))
            F.append(f)
            G.append(g)
            if i + 1 >= max_batches:
                break
        F, G = np.concatenate(F), np.concatenate(G)
        A = F.T @ F + ridge * np.eye(F.shape[1], dtype=F.dtype)
        self.W = np.linalg.solve(A, F.T @ G)
        return self

    def encode_image(self, images):
        assert self.W is not None, "call fit_aligner first"
        f = self.encode_features(images)
        if f.ndim == 3:
            f = f.mean(axis=1)
        return f @ jnp.asarray(self.W)

    def zero_shot_classifier(self, classnames, templates):
        from bcosification_tpu.training.zeroshot import zeroshot_classifier

        return zeroshot_classifier(
            self.text_model, self.text_vars, classnames, templates
        )

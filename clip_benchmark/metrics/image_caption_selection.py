"""Image-caption selection metric (Winoground/SugarCrepe-style).

Parity target: `/root/reference/CLIP_benchmark/clip_benchmark/metrics/
image_caption_selection.py`: each sample has image(s) and candidate captions
(first = positive); score = fraction where the positive caption gets the
highest image-text similarity.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["evaluate"]


def evaluate(model_bundle, loader) -> Dict[str, float]:
    from clip_benchmark.models import jit_encode_image

    encode_img = jit_encode_image(model_bundle)
    correct = total = 0
    for batch in loader:
        images, caps_batch = batch
        feats = np.asarray(encode_img(jnp.asarray(images)))
        if feats.ndim == 3:
            feats = feats.mean(axis=1)
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        for i, caps in enumerate(caps_batch):
            caps = caps if isinstance(caps, (list, tuple)) else [caps]
            if len(caps) < 2:
                continue
            txt = np.asarray(model_bundle.encode_texts(list(caps)))
            txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
            scores = txt @ feats[i]
            correct += int(np.argmax(scores) == 0)
            total += 1
    return {"image_caption_selection_acc": correct / max(total, 1)}

"""CLIP zero-shot classification utilities.

Parity target: `ZeroshotEval` machinery in
`/root/reference/bcos/training/trainer.py:104-355, 1073-1087`: prompt-ensembled
zeroshot weights from the CLIP text tower (per class: embed 80 templates,
normalise, mean, normalise), `logits = 100 * x_hat @ W`, attn-unpool
cosine-power spatial pooling, top-1/5 accuracy. Used both by the per-epoch
KD training callback and the CLIP_benchmark-compatible CLI.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "format_template",
    "zeroshot_classifier",
    "zeroshot_predict_logits",
    "zeroshot_evaluate",
    "save_zeroshot_weights",
    "load_zeroshot_weights",
]


def format_template(template: str, classname: str) -> str:
    """Specialise a prompt template for a class, supporting both upstream
    conventions: CLIP_benchmark templates use the named ``{c}`` placeholder
    (reference zeroshot_classification.py:48, and the webdataset
    `zeroshot_classification_templates.txt` files), the bcos/OpenAI ImageNet
    templates use bare ``{}``."""
    if "{c}" in template:
        return template.format(c=classname)
    return template.format(classname)


def save_zeroshot_weights(path: str, weights) -> None:
    """Persist a [D, C] zeroshot classifier matrix (the reference precomputes
    this once and `torch.load`s it per epoch, trainer.py:47-48)."""
    np.save(path, np.asarray(weights, dtype=np.float32), allow_pickle=False)


def load_zeroshot_weights(path: str) -> jnp.ndarray:
    """Load a precomputed zeroshot classifier (trainer.py:47-48
    `get_imagenet_zeroshot_weights`). Accepts .npy (ours) or a torch-saved
    tensor file (the reference's format) when torch is importable."""
    if path.endswith((".npy", ".npz")):
        arr = np.load(path, allow_pickle=False)
        if hasattr(arr, "files"):  # npz: single array expected
            arr = arr[arr.files[0]]
    else:
        import torch

        arr = torch.load(path, map_location="cpu")
        arr = arr.detach().cpu().numpy() if hasattr(arr, "detach") else np.asarray(arr)
    w = jnp.asarray(np.asarray(arr, dtype=np.float32))
    if w.ndim != 2:
        raise ValueError(f"zeroshot weights must be [D, C], got shape {w.shape}")
    return w


def zeroshot_classifier(
    text_model,
    text_variables,
    classnames: Sequence[str],
    templates: Sequence[str],
    batch_classes: int = 32,
) -> jnp.ndarray:
    """-> [D, n_classes] prompt-ensembled zeroshot weights (trainer.py:150-161).

    Batched over classes; each class embeds len(templates) prompts in one call.
    """
    from bcosification_tpu.clip.tokenizer import tokenize

    encode = jax.jit(lambda v, t: text_model.apply(v, t))
    weights = []
    for start in range(0, len(classnames), batch_classes):
        chunk = classnames[start : start + batch_classes]
        texts = [format_template(t, c) for c in chunk for t in templates]
        tokens = jnp.asarray(tokenize(texts))
        emb = encode(text_variables, tokens)  # [n_chunk * n_templ, D]
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        emb = emb.reshape(len(chunk), len(templates), -1).mean(axis=1)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        weights.append(emb)
    return jnp.concatenate(weights, axis=0).T  # [D, C]


def zeroshot_predict_logits(
    image_features: jnp.ndarray,
    zeroshot_weights: jnp.ndarray,
    cos_power: int = 0,
) -> jnp.ndarray:
    """logits = 100 * x_hat @ W; attn-unpool spatial features [B, HW, D] are
    cosine-power weighted and summed over locations (trainer.py:112-121).

    The reference's two unpool codepaths disagree here: its trainer SUMS
    over locations (trainer.py:121) while its CLIP_benchmark
    run_classification MEANS them (zeroshot_classification.py:131-132).
    The two differ by the constant factor HW, so argmax/accuracy/recall are
    identical; we follow the trainer's sum everywhere."""
    feats = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    logits = 100.0 * feats @ zeroshot_weights
    if logits.ndim == 3:  # [B, HW, C] attn-unpool
        p = max(cos_power, 1)
        logits = logits * jax.lax.stop_gradient(jnp.abs(logits)) ** (p - 1)
        logits = logits.sum(axis=1)
    return logits


# module-level jit: stable cache across the per-epoch KD zeroshot callback.
# A per-call `@jax.jit def step(...)` closure re-traced and recompiled the
# FULL image tower every epoch (plus once more for a ragged last batch) —
# minutes of serial compilation per epoch on a 1-core host (r5 review). The
# tower itself is compiled by the caller's jitted ``image_encode``; this
# only compiles the tiny normalise+matmul head, once per (shape, power).
_jit_predict = jax.jit(zeroshot_predict_logits, static_argnums=2)


def zeroshot_evaluate(
    image_encode: Callable[[jnp.ndarray], jnp.ndarray],
    loader: Iterable,
    zeroshot_weights: jnp.ndarray,
    cos_power: int = 0,
) -> Dict[str, float]:
    """top-1/5 zeroshot accuracy over a loader of {'image','label'} batches
    (trainer.py:104-132). Jit ``image_encode`` (with variables as an
    ARGUMENT, not a closure) for the tower compile to be reused across
    epochs."""
    top1 = top5 = n = 0
    for batch in loader:
        images = jnp.asarray(batch["image"])
        target = np.asarray(batch["label"])
        if target.ndim > 1:  # dense/one-hot labels (same guard as steps.py)
            target = np.argmax(target, axis=-1)
        feats = image_encode(images)
        logits = np.asarray(_jit_predict(feats, zeroshot_weights, cos_power))
        pred5 = np.argsort(-logits, axis=-1)[:, :5]
        top1 += int((pred5[:, 0] == target).sum())
        top5 += int((pred5 == target[:, None]).any(axis=1).sum())
        n += len(target)
    return {"acc1": top1 / max(n, 1), "acc5": top5 / max(n, 1)}

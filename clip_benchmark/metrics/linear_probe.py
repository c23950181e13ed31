"""Linear-probe metric.

Parity target: `/root/reference/CLIP_benchmark/clip_benchmark/metrics/
linear_probe.py`: a `Featurizer` with the B-cos fallback (models without
encode_image are called directly; 3D attn-unpool features mean-pooled over
locations, :41-54), feature caching to `feature_root`, an AdamW +
cosine-warmup linear head (:68-116), weight-decay peak search over a log grid
(`find_peak`, :137-148), and fewshot_k subsampling.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

__all__ = ["featurize", "train_linear_head", "find_peak", "evaluate"]


def featurize(model_bundle, loader, cache_path: Optional[str] = None):
    if cache_path and Path(cache_path + "_x.npy").exists():
        return np.load(cache_path + "_x.npy"), np.load(cache_path + "_y.npy")
    from clip_benchmark.models import jit_encode_image

    encode = jit_encode_image(model_bundle)
    xs, ys = [], []
    for batch in loader:
        images, target = batch if isinstance(batch, (tuple, list)) else (
            batch["image"],
            batch["label"],
        )
        feats = np.asarray(encode(jnp.asarray(images)))
        if feats.ndim == 3:  # attn-unpool [B, HW, D] -> mean over locations
            feats = feats.mean(axis=1)
        xs.append(feats)
        ys.append(np.asarray(target))
    x, y = np.concatenate(xs), np.concatenate(ys)
    if cache_path:
        Path(cache_path).parent.mkdir(parents=True, exist_ok=True)
        np.save(cache_path + "_x.npy", x)
        np.save(cache_path + "_y.npy", y)
    return x, y


def train_linear_head(
    x: np.ndarray,
    y: np.ndarray,
    num_classes: int,
    lr: float = 0.1,
    epochs: int = 10,
    batch_size: int = 256,
    weight_decay: float = 0.0,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AdamW + cosine schedule with warmup (linear_probe.py:68-116)."""
    n, d = x.shape
    steps_per_epoch = max(n // batch_size, 1)
    total = epochs * steps_per_epoch
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(total // 50, 1), decay_steps=total
    )
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    params = {
        "w": jnp.zeros((d, num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = xb @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(steps_per_epoch):
            idx = order[i * batch_size : (i + 1) * batch_size]
            params, opt_state, _ = step(params, opt_state, xj[idx], yj[idx])
    return params["w"], params["b"]


def _eval_head(w, b, x, y) -> float:
    logits = np.asarray(jnp.asarray(x) @ w + b)
    return float((logits.argmax(-1) == y).mean())


def find_peak(
    x_train, y_train, x_val, y_val, num_classes, lr, epochs, seed
) -> float:
    """Log-grid weight-decay peak search (linear_probe.py:137-148)."""
    wd_grid = [0.0] + [10.0**e for e in range(-6, 2)]
    best_wd, best_acc = 0.0, -1.0
    for wd in wd_grid:
        w, b = train_linear_head(
            x_train, y_train, num_classes, lr=lr, epochs=max(epochs // 2, 1),
            weight_decay=wd, seed=seed,
        )
        acc = _eval_head(w, b, x_val, y_val)
        if acc > best_acc:
            best_wd, best_acc = wd, acc
    return best_wd


def evaluate(
    model_bundle,
    train_loader,
    test_loader,
    fewshot_k: int = -1,
    fewshot_lr: float = 0.1,
    fewshot_epochs: int = 10,
    batch_size: int = 256,
    feature_root: str = "features",
    model_id: str = "model",
    dataset_name: str = "dataset",
    seed: int = 0,
    use_val_for_wd: bool = False,
) -> Dict[str, float]:
    cache = os.path.join(feature_root, f"{model_id}_{dataset_name}")
    x_train, y_train = featurize(model_bundle, train_loader, cache + "_train")
    x_test, y_test = featurize(model_bundle, test_loader, cache + "_test")
    num_classes = int(max(y_train.max(), y_test.max())) + 1

    if fewshot_k > 0:
        rng = np.random.default_rng(seed)
        keep = []
        for c in range(num_classes):
            idx = np.where(y_train == c)[0]
            keep.extend(rng.permutation(idx)[:fewshot_k])
        keep = np.asarray(keep)
        x_train, y_train = x_train[keep], y_train[keep]

    wd = 0.0
    if use_val_for_wd and len(x_train) > 10:
        n_val = max(len(x_train) // 10, 1)
        wd = find_peak(
            x_train[n_val:], y_train[n_val:], x_train[:n_val], y_train[:n_val],
            num_classes, fewshot_lr, fewshot_epochs, seed,
        )
    w, b = train_linear_head(
        x_train, y_train, num_classes, lr=fewshot_lr, epochs=fewshot_epochs,
        batch_size=batch_size, weight_decay=wd, seed=seed,
    )
    acc1 = _eval_head(w, b, x_test, y_test)
    return {"lp_acc1": acc1, "weight_decay": wd}

"""Exponential moving average of the full model state (params + batch_stats —
torchvision AveragedModel(use_buffers=True)).

Parity target: `/root/reference/bcos/training/ema.py` and the decay adjustment
in `/root/reference/bcos/training/trainer.py:540-561`:

    adjust = world_size * batch_size * ema_steps * accumulate / epochs
    alpha  = min(1.0, (1 - ema_decay) * adjust)
    decay  = 1 - alpha

and the EMA is updated every ``ema_steps`` optimizer steps
(trainer.py:776-780).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

__all__ = ["adjusted_ema_decay", "ema_update", "maybe_ema_update"]


def adjusted_ema_decay(
    ema_decay: float,
    world_size: int,
    batch_size: int,
    max_epochs: int,
    ema_steps: int = 32,
    accumulate_grad_batches: int = 1,
) -> float:
    adjust = world_size * batch_size * ema_steps * accumulate_grad_batches / max_epochs
    alpha = min(1.0, (1 - ema_decay) * adjust)
    return 1.0 - alpha


def ema_update(ema_tree, new_tree, decay: float):
    """ema = decay * ema + (1 - decay) * new, leafwise. Integer leaves (e.g.
    num_batches_tracked) are copied (buffers in AveragedModel use the avg fn
    too, but fractional counts are meaningless — torch keeps them float; we
    copy to stay exact for ints)."""

    def f(e, n):
        if jnp.issubdtype(jnp.asarray(e).dtype, jnp.integer):
            return n
        return decay * e + (1.0 - decay) * n

    return jax.tree_util.tree_map(f, ema_tree, new_tree)


def maybe_ema_update(ema_tree, new_tree, decay: float, step, ema_steps: int):
    """Update every ema_steps steps (trainer.py:776-780), jit-friendly."""
    do = (step % ema_steps) == 0

    def upd(_):
        return ema_update(ema_tree, new_tree, decay)

    def keep(_):
        return ema_tree

    return jax.lax.cond(do, upd, keep, None)

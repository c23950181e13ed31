"""LR schedule factory producing optax schedules with torch scheduler
semantics.

Parity target: `/root/reference/bcos/optim/lr_scheduler_factory.py`
(StepLR / CosineAnnealingLR / ExponentialLR + linear/constant warmup,
epoch- or step-interval). In JAX the schedule is a pure function of the
optimizer step count, so "interval='epoch'" simply quantises to epochs.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Literal, Optional

import jax.numpy as jnp

__all__ = ["LRSchedulerFactory"]


@dataclasses.dataclass(frozen=True)
class LRSchedulerFactory:
    name: str
    step_size: int = 30  # epochs (StepLR)
    gamma: float = 0.1
    epochs: Optional[int] = None
    lr_min: float = 0.0
    interval: Literal["epoch", "step"] = "epoch"
    warmup_epochs: Optional[int] = None
    warmup_steps: Optional[int] = None
    warmup_method: str = "constant"
    warmup_decay: float = 0.01

    def __post_init__(self):
        assert self.name.lower() in ["steplr", "cosineannealinglr", "exponentiallr"]
        assert self.warmup_method.lower() in ["linear", "constant"]
        assert self.interval in ["epoch", "step"]
        if self.name.lower() == "cosineannealinglr":
            assert self.epochs and self.epochs > 0
        assert self.warmup_steps is None or self.warmup_epochs is None
        # ref lr_scheduler_factory.py:53-55 — with interval='epoch' a
        # warmup_steps value would be silently ignored (r5 review)
        assert self.interval == "step" or self.warmup_steps is None, (
            "For warmup_steps, interval must be 'step'"
        )

    def create(self, base_lr: float, steps_per_epoch: int) -> Callable:
        """Return schedule(step) -> lr. ``steps_per_epoch`` converts between
        epoch- and step-interval semantics."""
        name = self.name.lower()
        # scheduler "time" t: epochs (quantised) or steps
        if self.interval == "epoch":
            to_t = lambda step: step // steps_per_epoch
            warmup_iters = self.warmup_epochs or 0
        else:
            to_t = lambda step: step
            if self.warmup_steps is not None:
                warmup_iters = self.warmup_steps
            elif self.warmup_epochs is not None:
                warmup_iters = self.warmup_epochs * steps_per_epoch
            else:
                warmup_iters = 0

        # main scheduler horizon (torch: T_max excludes warmup, lr_scheduler_factory.py:81-90)
        if name == "cosineannealinglr":
            t_max = self.epochs - (self.warmup_epochs or 0)
            if self.interval == "step":
                t_max = self.epochs * steps_per_epoch
                if self.warmup_steps is not None:
                    t_max -= self.warmup_steps
                elif self.warmup_epochs is not None:
                    t_max -= self.warmup_epochs * steps_per_epoch
        elif name == "steplr":
            step_size = self.step_size * (
                steps_per_epoch if self.interval == "step" else 1
            )

        def main_lr(t):
            if name == "steplr":
                return base_lr * self.gamma ** (t // step_size)
            if name == "cosineannealinglr":
                frac = jnp.clip(t / max(t_max, 1), 0.0, 1.0)
                return self.lr_min + (base_lr - self.lr_min) * 0.5 * (
                    1.0 + jnp.cos(jnp.pi * frac)
                )
            if name == "exponentiallr":
                return base_lr * self.gamma**t
            raise ValueError(name)

        wm = self.warmup_method.lower()

        def schedule(step):
            t = to_t(step)
            if warmup_iters == 0:
                return main_lr(t)
            in_warmup = t < warmup_iters
            if wm == "linear":
                # torch LinearLR: factor from warmup_decay -> 1 over total_iters
                frac = jnp.clip(t / max(warmup_iters, 1), 0.0, 1.0)
                warm = base_lr * (self.warmup_decay + (1 - self.warmup_decay) * frac)
            else:  # constant
                warm = base_lr * self.warmup_decay
            return jnp.where(in_warmup, warm, main_lr(jnp.maximum(t - warmup_iters, 0)))

        return schedule

    def with_epochs(self, epochs: Optional[int]):
        return dataclasses.replace(self, epochs=epochs)

    def __to_config__(self):
        return {k: v for k, v in dataclasses.asdict(self).items() if v is not None}

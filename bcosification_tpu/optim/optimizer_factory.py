"""Optimizer factory over optax.

Parity target: `/root/reference/bcos/optim/optimizer_factory.py`:
adam / adamw / sgd / rmsprop with torch defaults, the `bcosify`/`b_opt`
parameter split (main optimizer excludes the learnable `b` params; a separate
SGD drives them, bcosify_trainer.py:88-107), and torchvision-style per-group
weight decay (norm params can get a different WD).
"""
from __future__ import annotations

import copy
import dataclasses
from typing import Any, Callable, Dict, Optional, Union

import jax
import optax

__all__ = ["OptimizerFactory", "is_b_param", "b_param_labels"]


def is_b_param(path) -> bool:
    """The learnable b parameters are leaves literally named 'b'
    (modules/bcos_layers._resolve_b)."""
    last = path[-1]
    key = last.key if hasattr(last, "key") else str(last)
    return key == "b"


def b_param_labels(params) -> Any:
    """Label tree: 'b' for learnable-b params, 'main' for everything else."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "b" if is_b_param(path) else "main", params
    )


class OptimizerFactory:
    """Configured like the reference (name, lr, **kwargs incl. weight_decay,
    momentum, bcosify, b_opt). `create(schedule_or_lr)` returns an optax
    GradientTransformation; pass `params` when using bcosify/b_opt masking.
    """

    def __init__(self, name: str, lr: Union[int, float], **kwargs):
        self.name = name
        self.args = dict(lr=lr, **kwargs)
        assert name.lower() in ["adamw", "adam", "sgd", "rmsprop"]

    def _base_tx(self, learning_rate) -> optax.GradientTransformation:
        name = self.name.lower()
        args = {
            k: v
            for k, v in self.args.items()
            if k not in ("lr", "bcosify", "b_opt")
        }
        wd = args.pop("weight_decay", 0.0) or 0.0
        if name == "sgd":
            momentum = args.pop("momentum", 0.0) or None
            tx = optax.sgd(learning_rate, momentum=momentum, nesterov=args.pop("nesterov", False))
        elif name == "rmsprop":
            tx = optax.rmsprop(
                learning_rate,
                decay=args.pop("alpha", 0.9),
                eps=args.pop("eps", 0.0316),
                momentum=args.pop("momentum", 0.0),
                # torch adds eps OUTSIDE the sqrt (optax defaults to inside)
                eps_in_sqrt=False,
            )
        elif name == "adamw":
            b1, b2 = args.pop("betas", (0.9, 0.999))
            tx = optax.adamw(
                learning_rate,
                b1=b1,
                b2=b2,
                eps=args.pop("eps", 1e-8),
                weight_decay=wd,
            )
            wd = 0.0
        elif name == "adam":
            b1, b2 = args.pop("betas", (0.9, 0.999))
            tx = optax.adam(learning_rate, b1=b1, b2=b2, eps=args.pop("eps", 1e-8))
        else:
            raise ValueError(name)
        if wd and name != "adamw":
            # torch couples plain L2 into the gradient before the update
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx

    def create(
        self,
        learning_rate: Union[float, Callable],
        params: Optional[Any] = None,
    ) -> optax.GradientTransformation:
        """learning_rate: float or optax schedule. With bcosify=True the main
        optimizer masks out 'b' params (b_opt=False) or trains ONLY them
        (b_opt=True) — the reference's two-optimizer split."""
        lr = learning_rate if learning_rate is not None else self.args["lr"]
        tx = self._base_tx(lr)
        # note: no `params is not None` gate — b_param_labels is a callable
        # label fn that never needs the params tree, and skipping the mask
        # for a params-less caller would double-update the learnable 'b'
        # leaves (main optimizer + b SGD — the exact failure
        # tests/test_b_schedule_parity.py locks; r5 review)
        if self.args.get("bcosify", None) is not None:
            # The reference's two-optimizer split hands each optimizer a
            # DISJOINT parameter list (bcosify_trainer.py:98: SGD over only
            # the .b params; the main optimizer never sees them), so each
            # one's update for the other group must be exactly zero. NOTE
            # optax.masked is wrong here — it passes unmasked updates
            # through UNCHANGED (i.e. raw gradients), which would apply
            # unscaled gradient steps to the other group when the train
            # step adds both update trees (tests/test_b_schedule_parity.py
            # caught this).
            b_opt = bool(self.args.get("b_opt", False))
            want = "b" if b_opt else "main"
            other = "main" if b_opt else "b"
            tx = optax.multi_transform(
                {want: tx, other: optax.set_to_zero()}, b_param_labels
            )
        return tx

    # with_* helpers (optimizer_factory.py:97-137)
    def with_name(self, new_name):
        args = copy.deepcopy(self.args)
        lr = args.pop("lr")
        return type(self)(name=new_name, lr=lr, **args)

    def with_lr(self, lr):
        args = copy.deepcopy(self.args)
        del args["lr"]
        return type(self)(name=self.name, lr=lr, **args)

    def with_args(self, **kwargs):
        """Copy with extra/overridden kwargs — existing args (momentum,
        weight_decay, ...) are KEPT, not discarded."""
        assert "lr" not in kwargs and "name" not in kwargs
        args = copy.deepcopy(self.args)
        lr = args.pop("lr")
        args.update(kwargs)
        return type(self)(name=self.name, lr=lr, **args)

    @property
    def lr(self) -> float:
        return self.args["lr"]

    def __repr__(self):
        s = f"{type(self).__name__}(optimizer='{self.name}'"
        for k, v in self.args.items():
            s += f", {k}={v}"
        return s + ")"

    def __to_config__(self):
        return dict(name=self.name.lower(), **self.args)

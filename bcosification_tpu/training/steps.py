"""Train/eval steps — the TPU-native core of the training orchestration.

Parity target: `ClassificationLitModel.training_step` + optimizer/EMA/AGC
wiring (`/root/reference/bcos/training/trainer.py:369-910`) and the
manual-optimisation `BcosifyTrainer` (two optimizers: main + SGD over the
learnable `b` params, `/root/reference/bcos/training/bcosify_trainer.py:76-165`).

Design: one jitted `train_step(state, batch)` under a data mesh — batch
sharded over 'data', state replicated; XLA inserts the gradient psum over ICI
(the DDP allreduce). BN batch statistics are computed over the *global* batch
(an upgrade over DDP's per-replica stats — exact, not approximate). The
learnable-b machinery is explicit: the b:1->2 interpolation schedule (the
reference's forced-gradient hook, training/hooks.py:7-23) writes the b leaves
directly; the `b_loss`/`clamping` variants train them with the auxiliary SGD.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from bcosification_tpu.optim.optimizer_factory import b_param_labels, is_b_param
from bcosification_tpu.training import agc as agc_lib
from bcosification_tpu.training import ema as ema_lib

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "set_b_params",
    "make_linear_b_schedule",
]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    b_opt_state: Optional[Any] = None
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None


def set_b_params(params, value):
    """Overwrite every learnable-b leaf with `value` — the explicit form of the
    reference's gradient-hook b schedule (hooks.py:7-23)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.full_like(p, value) if is_b_param(path) else p, params
    )


def make_linear_b_schedule(
    b_at_start: float = 1.0,
    b_at_end: float = 2.0,
    b_lr: float = 1e-4,
    world_size: int = 1,
    batch_size: int = 1,
):
    """Closed form of the reference's forced-gradient b interpolation.

    The reference registers a gradient hook on every learnable ``b`` that
    replaces the loss gradient with ``-batch_size`` while
    ``b_at_start <= b < b_at_end`` and zeroes it once ``b >= b_at_end``
    (hooks.py:7-23); a dedicated ``SGD(lr=b_lr * num_gpus)`` then steps it
    every batch (bcosify_trainer.py:88-107, incl. the lr x num_gpus
    scaling). Each SGD step is therefore a constant increment

        delta = b_lr * num_gpus * per_device_batch_size,

    starting from ``b_at_start + 1e-6`` (trainer.py:463 initialises b there
    to dodge the b==1 fast path) and freezing at the FIRST value >= b_at_end
    (the crossing step overshoots and stays). The returned ``schedule(step)``
    reproduces that trajectory exactly: b(t) = start + min(t, K) * delta with
    K the first t whose value crosses ``b_at_end``.

    ``world_size * batch_size`` must be the GLOBAL per-step batch — callers
    on the sharded-global-batch path pass world_size=1 (devices shard the
    loader batch, they don't multiply it), matching the reference's
    num_gpus * per_gpu_batch product. Differentially tested against the
    reference's own Hook + SGD in tests/test_b_schedule_parity.py.
    """
    start = float(b_at_start) + 1e-6
    delta = float(b_lr) * int(world_size) * int(batch_size)
    if delta <= 0:
        raise ValueError(f"linear_b needs a positive increment, got {delta}")
    if start >= float(b_at_end):
        k_freeze = 0  # the hook zeroes gradients from the first backward on
    else:
        k_freeze = math.ceil((float(b_at_end) - start) / delta)

    def schedule(step):
        k = jnp.minimum(step, k_freeze).astype(jnp.float32)
        return jnp.float32(start) + k * jnp.float32(delta)

    return schedule


def create_train_state(
    variables,
    tx: optax.GradientTransformation,
    b_tx: Optional[optax.GradientTransformation] = None,
    with_ema: bool = False,
) -> TrainState:
    # copy, never alias: train_step donates its state, and device_put (e.g.
    # mesh.replicate) can alias the device-0 shard to the source buffer — a
    # donating step would then delete the CALLER's `variables` leaves too
    # (breaks any second fit / restart from the same init in-process)
    params = jax.tree_util.tree_map(jnp.copy, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        jnp.copy, variables.get("batch_stats", {})
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        b_opt_state=b_tx.init(params) if b_tx is not None else None,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if with_ema else None,
        ema_batch_stats=(
            jax.tree_util.tree_map(jnp.copy, batch_stats) if with_ema else None
        ),
    )


def make_train_step(
    model,
    criterion: Callable,
    tx: optax.GradientTransformation,
    b_tx: Optional[optax.GradientTransformation] = None,
    *,
    use_agc: bool = False,
    agc_clip_factor: float = 0.01,
    gradient_clip_val: Optional[float] = None,
    ema_decay: Optional[float] = None,
    ema_steps: int = 32,
    b_schedule: Optional[Callable] = None,
    donate: bool = True,
    amp: bool = False,
):
    """Build the jitted train step.

    - use_agc: NFNet adaptive clipping (trainer.py:872-883), applied to grads
      before the main optimizer; mutually exclusive with gradient_clip_val
      (plain global-norm clip).
    - ema_decay: enables EMA (params + batch_stats) every ema_steps.
    - b_schedule(step) -> b value: overwrites learnable-b leaves (interpolated
      b variant); b grads are then ignored.
    - b_tx: auxiliary optimizer over the b leaves (manual-optim variant).
    - amp: bf16 activations/compute with fp32 params + optimizer state — the
      TPU-native mixed precision (reference --amp -> PL precision=16,
      trainer.py:929-930); our ops cast weights to the activation dtype and
      keep fp32 islands for norms/accumulation.
    """
    if use_agc and gradient_clip_val:
        raise ValueError(
            "use_agc and gradient_clip_val are mutually exclusive: AGC would "
            "silently replace the configured global-norm clip (r5 review)"
        )

    def loss_fn(params, batch_stats, batch):
        image = batch["image"]
        if amp:
            image = image.astype(jnp.bfloat16)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            image,
            train=True,
            mutable=["batch_stats"],
        )
        out = out.astype(jnp.float32)
        loss = criterion(out, batch["label"])
        return loss, (out, mutated.get("batch_stats", {}))

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        params = state.params
        if b_schedule is not None:
            params = set_b_params(params, b_schedule(state.step))

        (loss, (out, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state.batch_stats, batch
        )

        main_grads = grads
        if use_agc:
            main_grads = agc_lib.adaptive_clip_grads(
                params, main_grads, clip_factor=agc_clip_factor
            )
        elif gradient_clip_val:
            gnorm = optax.global_norm(main_grads)
            scale = jnp.minimum(1.0, gradient_clip_val / (gnorm + 1e-6))
            main_grads = jax.tree_util.tree_map(lambda g: g * scale, main_grads)

        updates, opt_state = tx.update(main_grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        b_opt_state = state.b_opt_state
        if b_tx is not None:
            b_updates, b_opt_state = b_tx.update(grads, state.b_opt_state, params)
            new_params = optax.apply_updates(new_params, b_updates)

        step = state.step + 1
        if b_schedule is not None:
            # pin the stored b leaves to the value the NEXT forward will use,
            # so checkpoints/EMA never carry a main-optimizer residue on b
            # (the reference's main optimizer simply never sees the b params,
            # optimizer_factory.py:62-64)
            new_params = set_b_params(new_params, b_schedule(step))
        ema_params, ema_bs = state.ema_params, state.ema_batch_stats
        if ema_decay is not None and ema_params is not None:
            ema_params = ema_lib.maybe_ema_update(
                ema_params, new_params, ema_decay, step, ema_steps
            )
            ema_bs = ema_lib.maybe_ema_update(
                ema_bs, new_bs, ema_decay, step, ema_steps
            )

        new_state = state.replace(
            step=step,
            params=new_params,
            batch_stats=new_bs,
            opt_state=opt_state,
            b_opt_state=b_opt_state,
            ema_params=ema_params,
            ema_batch_stats=ema_bs,
        )
        metrics = {
            "loss": loss,
            "acc1": jnp.mean(
                (jnp.argmax(out, -1) == _dense_to_sparse(batch["label"])).astype(
                    jnp.float32
                )
            ),
            # --track_grad_norm (trainer.py:885-910); cheap enough to always log
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _dense_to_sparse(label):
    return label if label.ndim == 1 else jnp.argmax(label, -1)


def make_eval_step(model, test_criterion: Optional[Callable] = None, use_ema: bool = False):
    """Jitted eval step returning (loss?, top1 correct, top5 correct) counts."""

    def eval_step(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        out = model.apply(
            {"params": params, "batch_stats": bs}, batch["image"], train=False
        )
        label = _dense_to_sparse(batch["label"])
        k = min(5, out.shape[-1])
        topk = jax.lax.top_k(out, k)[1]
        correct1 = (jnp.argmax(out, -1) == label).astype(jnp.float32)
        correct5 = jnp.any(topk == label[:, None], axis=-1).astype(jnp.float32)
        metrics = {
            "correct1": correct1.sum(),
            "correct5": correct5.sum(),
            "count": jnp.asarray(label.shape[0], jnp.float32),
        }
        if test_criterion is not None:
            metrics["loss"] = test_criterion(out, batch["label"]) * label.shape[0]
        return metrics

    return jax.jit(eval_step)

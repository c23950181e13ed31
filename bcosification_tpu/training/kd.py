"""CLIP knowledge-distillation training (the SigLIP recipe).

Parity target: the clip_kd branches of `ClassificationLitModel`
(`/root/reference/bcos/training/trainer.py:652-724`): dual forward — frozen
fp32 CLIP teacher on CLIP-normalised 3-channel images, B-cosified student on
AddInverse 6-channel images — L2-normalised features into SigLipLoss with
fixed logit_scale=10 / logit_bias=-10 (or the model's learned ones), and the
attn-unpool cosine-power spatial pooling.

Two distribution modes for the pairwise loss:
- 'global' (default): the full global BxB similarity matrix under pjit — XLA
  shards the matmul and inserts the collectives; numerically equal to the
  reference's ring total (which sums world_size per-hop block losses, each
  normalised by the local batch).
- 'ring': shard_map + lax.ppermute neighbour exchange, structurally identical
  to the reference's NCCL P2P ring (losses.py:643-692) — O(world) hops with
  compute/ICI overlap, preferable at large world sizes.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from bcosification_tpu.data.presets import CLIP_MEAN, CLIP_STD
from bcosification_tpu.losses import SigLipLoss
from bcosification_tpu.parallel.mesh import DATA_AXIS
from bcosification_tpu.training import agc as agc_lib
from bcosification_tpu.training import steps as steps_lib

__all__ = ["make_kd_train_step", "kd_forward_features"]


def _l2(x):
    # eps guards 0/0 for degenerate (random-init) features; pretrained
    # feature norms are always nonzero
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


def kd_forward_features(
    student,
    teacher,
    student_variables,
    teacher_variables,
    images,  # raw [0,1], NHWC 3ch
    *,
    train: bool = False,
    explain: bool = False,
):
    """Dual forward (trainer.py:652-664). Returns (teacher_feat, student_out,
    mutated_student_batch_stats)."""
    x3 = (images - jnp.asarray(CLIP_MEAN, images.dtype)) / jnp.asarray(
        CLIP_STD, images.dtype
    )
    x6 = jnp.concatenate([images, 1.0 - images], axis=-1)
    t_feat = teacher.apply(teacher_variables, x3, train=False)
    t_feat = jax.lax.stop_gradient(t_feat)
    if train:
        s_out, mutated = student.apply(
            student_variables, x6, train=True, mutable=["batch_stats"]
        )
        return t_feat, s_out, mutated.get("batch_stats", {})
    s_out = student.apply(student_variables, x6, train=False, explain=explain)
    return t_feat, s_out, None


def make_kd_train_step(
    student,
    teacher,
    teacher_variables,
    tx: optax.GradientTransformation,
    *,
    logit_scale: float = 10.0,
    logit_bias: float = -10.0,
    cos_power: int = 0,
    use_agc: bool = True,
    agc_clip_factor: float = 0.01,
    loss_mode: str = "global",
    mesh=None,
    ema_decay: Optional[float] = None,
    ema_steps: int = 32,
    donate: bool = True,
    amp: bool = False,
):
    """Jitted KD train step over a data mesh. ``amp``: bf16 activations for
    BOTH branches (teacher + student) over fp32 params (reference --amp ->
    PL precision=16)."""
    assert loss_mode in ("global", "ring")
    ring_loss = SigLipLoss(axis_name=DATA_AXIS)
    local_loss = SigLipLoss()

    def siglip(s_feat, t_feat):
        if loss_mode == "global" or mesh is None:
            # full-matrix loss == DDP-mean of the reference's per-rank ring
            # totals: mean_r(row_r_sum/local_b) = full_sum/global_b
            return local_loss(
                s_feat, t_feat, logit_scale, logit_bias, cos_scaling=cos_power
            )
        from jax import shard_map

        def f(s, t):
            return jax.lax.pmean(
                ring_loss(s, t, logit_scale, logit_bias, cos_scaling=cos_power),
                DATA_AXIS,
            )

        spec = P(DATA_AXIS) if cos_power == 0 else P(None, DATA_AXIS)
        return shard_map(
            f, mesh=mesh, in_specs=(spec, P(DATA_AXIS)), out_specs=P()
        )(s_feat, t_feat)

    def loss_fn(params, batch_stats, images):
        t_feat, s_out, new_bs = kd_forward_features(
            student,
            teacher,
            {"params": params, "batch_stats": batch_stats},
            teacher_variables,
            images,
            train=True,
        )
        s_feat = _l2(s_out)
        t_feat = _l2(t_feat)
        if s_feat.ndim == 3:
            # attn_unpool students emit batch-first [B, HW, D]
            # (modules/bcosattnpool.py:99); SigLipLoss's cos_scaling path is
            # location-first (HW, B, D) — logits.mean(axis=0) pools
            # LOCATIONS and shape[1] is the batch (losses.py:384-410, the
            # convention its parity test locks). Without this transpose the
            # loss pools over the batch axis (or shape-errors when HW != B).
            s_feat = jnp.swapaxes(s_feat, 0, 1)
        loss = siglip(s_feat, t_feat)
        return loss, new_bs

    def train_step(state: steps_lib.TrainState, batch):
        images = batch["image"]
        if amp:
            images = images.astype(jnp.bfloat16)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images
        )
        if use_agc:
            grads = agc_lib.adaptive_clip_grads(
                state.params, grads, clip_factor=agc_clip_factor
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema_params, ema_bs = state.ema_params, state.ema_batch_stats
        if ema_decay is not None and ema_params is not None:
            from bcosification_tpu.training import ema as ema_lib

            ema_params = ema_lib.maybe_ema_update(
                ema_params, new_params, ema_decay, step, ema_steps
            )
            ema_bs = ema_lib.maybe_ema_update(ema_bs, new_bs, ema_decay, step, ema_steps)
        new_state = state.replace(
            step=step,
            params=new_params,
            batch_stats=new_bs,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_batch_stats=ema_bs,
        )
        return new_state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())

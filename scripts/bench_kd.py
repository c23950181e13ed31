"""CLIP-KD training-step throughput (the SigLIP distillation recipe).

Completes the perf story next to bench.py (fwd+explain), bench_train.py
(supervised step) and bench_clip.py (encode / text explain): one full KD
step — frozen CLIP-RN50 teacher forward + B-cosified student forward+backward
+ SigLipLoss + Adam — batch 128 bf16, one chip. Reference recipe:
`/root/reference/bcos/experiments/ImageNet/clip_bcosification/
experiment_parameters.py:76-104` (teacher `model.visual`, student
BcosifyNetwork, SigLipLoss logit_scale e^log(10), bias −10).

Run on TPU: python scripts/bench_kd.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

B = int(os.getenv("BENCH_BATCH", "128"))


def main():
    from bcosification_tpu.bcosify.clip_import import (
        build_bcosified_clip_visual,
        build_clip_teacher_visual,
    )
    from bcosification_tpu.clip.model import clip_rn50_config
    from bcosification_tpu.losses import SigLipLoss

    cfg = clip_rn50_config()
    model_config = {
        "bcosify_args": {"clip_kd": True, "use_bias": False},
        "bcos_args": {"b": 2},
    }
    student, svars = build_bcosified_clip_visual(model_config, None, cfg)
    teacher, tvars = build_clip_teacher_visual(None, cfg)
    loss_fn = SigLipLoss()

    tx = optax.adam(1e-4)
    opt_state = tx.init(svars["params"])

    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.random((B, 224, 224, 3), dtype=np.float32))

    def kd_loss(params, batch_stats, x3):
        # teacher: CLIP-normalised 3ch; student: AddInverse 6ch (trainer.py:652-664)
        t_feats = teacher.apply(tvars, x3.astype(jnp.bfloat16), train=False)
        t_feats = jax.lax.stop_gradient(t_feats)
        x6 = jnp.concatenate([x3, 1.0 - x3], axis=-1).astype(jnp.bfloat16)
        s_feats, mutated = student.apply(
            {"params": params, "batch_stats": batch_stats},
            x6,
            train=True,
            mutable=["batch_stats"],
        )
        loss = loss_fn(
            s_feats.astype(jnp.float32),
            t_feats.astype(jnp.float32),
            jnp.exp(jnp.log(10.0)),
            -10.0,
        )
        return loss, mutated["batch_stats"]

    def step(params, bs, opt_state, x3):
        (loss, bs), grads = jax.value_and_grad(kd_loss, has_aux=True)(params, bs, x3)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss

    @partial(jax.jit, static_argnums=(1,))
    def loop(carry, n):
        def body(i, carry):
            params, bs, opt_state, acc = carry
            params, bs, opt_state, loss = step(params, bs, opt_state, x3)
            return params, bs, opt_state, acc + loss

        params, bs, opt_state, acc = jax.lax.fori_loop(
            0, n, body, (*carry, jnp.float32(0))
        )
        # real data dependency on the updated params (a *0 term would be DCE'd)
        return acc + jax.tree_util.tree_leaves(params)[0].astype(jnp.float32).sum() * 1e-12

    carry = (svars["params"], svars.get("batch_stats", {}), opt_state)
    print("compiling n=2 ...", flush=True)
    float(loop(carry, 2))
    print("n=2 compiled", flush=True)
    n_small, n_big = 2, 12
    float(loop(carry, n_big))
    print("n_big compiled", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(carry, n_small)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(carry, n_big)); tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    print(
        f"KD step (B={B}, bf16): {best*1e3:.2f} ms = {B/best:.0f} img/s/chip"
    )


if __name__ == "__main__":
    main()

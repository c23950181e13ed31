"""Probe 15: CLIP-KD step bisection — where do the ~84 ms (batch 128) go?

bench.py (explain), bench_train.py (supervised step) and bench_clip.py all
have bound analyses in docs/PERF.md; the KD step (scripts/bench_kd.py,
84.2 ms / 1520 img/s) never did. Expectation from parts: frozen teacher
forward ~13.3 ms (bench_clip encode) + student train fwd+bwd ≈ a supervised
step of the ModifiedResNet tower + SigLIP (local, tiny) + Adam (measured
free, probe 11). This probe isolates, in ONE process (modes are set
per-process — perf_probe10 — so stages are comparable within a run):

  teacher        frozen CLIP-RN50 teacher forward, bf16
  student-fwd    B-cosified student forward only (train=True, BN mutation)
  student-bwd    student fwd+bwd on a mean-feature loss (no teacher/SigLIP)
  kd-loss        teacher + student fwd+bwd through SigLipLoss (no optimizer)
  full           + Adam (= scripts/bench_kd.py)
  teacher-arg    full, but teacher params passed as jit ARGUMENTS instead of
                 closed-over constants (does const-embedding the frozen
                 teacher buy anything? the trainer passes them as state)

Reference recipe: /root/reference/bcos/experiments/ImageNet/
clip_bcosification/experiment_parameters.py:76-104; dual-forward
/root/reference/bcos/training/trainer.py:652-664.

Run on TPU: python scripts/perf_probe15.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

B = int(os.getenv("BENCH_BATCH", "128"))


def slope(jitted_loop, n_small=2, n_big=12, reps=3):
    float(jitted_loop(n_small))
    float(jitted_loop(n_big))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter(); float(jitted_loop(n_small)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jitted_loop(n_big)); tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    return best


def report(name, t):
    print(f"{name:14s} {t*1e3:7.2f} ms  {B/t:6.0f} img/s", flush=True)


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
    x6 = jnp.concatenate([x3, 1.0 - x3], axis=-1).astype(jnp.bfloat16)
    params0, bs0 = svars["params"], svars.get("batch_stats", {})

    # --- teacher forward only ------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def teacher_loop(n):
        def body(i, acc):
            f = teacher.apply(tvars, (x3 + acc * 1e-20).astype(jnp.bfloat16), train=False)
            return f.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    report("teacher", slope(teacher_loop))

    # --- student forward only ------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def sfwd_loop(n):
        def body(i, carry):
            acc, bs = carry
            f, mut = student.apply(
                {"params": params0, "batch_stats": bs},
                x6 + acc.astype(jnp.bfloat16) * 1e-20,
                train=True,
                mutable=["batch_stats"],
            )
            return f.astype(jnp.float32).sum(), mut["batch_stats"]

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), bs0))
        return acc

    report("student-fwd", slope(sfwd_loop))

    # --- student fwd+bwd, mean-feature loss ---------------------------------
    def sloss(params, bs):
        f, mut = student.apply(
            {"params": params, "batch_stats": bs},
            x6,
            train=True,
            mutable=["batch_stats"],
        )
        return f.astype(jnp.float32).mean(), mut["batch_stats"]

    @partial(jax.jit, static_argnums=(0,))
    def sbwd_loop(n):
        def body(i, carry):
            acc, p, bs = carry
            (loss, bs), grads = jax.value_and_grad(sloss, has_aux=True)(p, bs)
            p = jax.tree_util.tree_map(lambda a, g: a - 1e-20 * g, p, grads)
            return acc + loss, p, bs

        acc, _, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), params0, bs0))
        return acc

    report("student-bwd", slope(sbwd_loop))

    # --- full KD loss fwd+bwd (no optimizer) --------------------------------
    def kd_loss(params, bs, teacher_params):
        t_feats = teacher.apply(teacher_params, x3.astype(jnp.bfloat16), train=False)
        t_feats = jax.lax.stop_gradient(t_feats)
        s_feats, mut = student.apply(
            {"params": params, "batch_stats": bs},
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
        return loss, mut["batch_stats"]

    @partial(jax.jit, static_argnums=(0,))
    def kdbwd_loop(n):
        def body(i, carry):
            acc, p, bs = carry
            (loss, bs), grads = jax.value_and_grad(kd_loss, has_aux=True)(p, bs, tvars)
            p = jax.tree_util.tree_map(lambda a, g: a - 1e-20 * g, p, grads)
            return acc + loss, p, bs

        acc, _, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), params0, bs0))
        return acc

    report("kd-loss", slope(kdbwd_loop))

    # --- full step (closure teacher = bench_kd) ------------------------------
    def make_full(pass_teacher_as_arg):
        def step(params, bs, opt_state, teacher_params):
            (loss, bs), grads = jax.value_and_grad(kd_loss, has_aux=True)(
                params, bs, teacher_params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, bs, opt_state, loss

        if pass_teacher_as_arg:
            # teacher params are a TRACED jit argument here (device buffers,
            # like the trainer's state) vs the closed-over constants below
            @partial(jax.jit, static_argnums=(0,))
            def loop_arg(n, tv):
                def body(i, carry):
                    params, bs, ost, acc = carry
                    params, bs, ost, loss = step(params, bs, ost, tv)
                    return params, bs, ost, acc + loss

                params, bs, ost, acc = jax.lax.fori_loop(
                    0, n, body, (params0, bs0, opt_state, jnp.float32(0))
                )
                return acc + jax.tree_util.tree_leaves(params)[0].astype(jnp.float32).sum() * 1e-12

            tdev = jax.device_put(tvars)

            def loop(n):
                return loop_arg(n, tdev)

        else:

            @partial(jax.jit, static_argnums=(0,))
            def loop(n):
                def body(i, carry):
                    params, bs, ost, acc = carry
                    params, bs, ost, loss = step(params, bs, ost, tvars)
                    return params, bs, ost, acc + loss

                params, bs, ost, acc = jax.lax.fori_loop(
                    0, n, body, (params0, bs0, opt_state, jnp.float32(0))
                )
                return acc + jax.tree_util.tree_leaves(params)[0].astype(jnp.float32).sum() * 1e-12

        return loop

    report("full", slope(make_full(False)))
    report("teacher-arg", slope(make_full(True)))


if __name__ == "__main__":
    main()

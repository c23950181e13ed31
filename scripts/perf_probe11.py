"""Probe 11: train-step bisection — where do the 61.7 ms (batch 128) go?

The explain path got a full bound analysis (docs/PERF.md); the TRAINING step
never did. fwd(train) is ~11 ms, so a canonical conv-net step (~3x fwd)
would be ~33 ms — measured is ~62. This probe isolates, in ONE process
(mode-comparable, see perf_probe10):

  fwd        forward only (train=True, BN stats mutation)
  fwd+bwd    value_and_grad, gradients materialised, no optimizer
  +adam      + AGC off, EMA off, metrics off
  +agc       + adaptive gradient clipping
  +ema       + EMA update (every 32 steps -> amortised)
  full       the production step (= scripts/bench_train.py)
  full-sgd   production but SGD (isolates Adam's moment traffic)

Run on TPU: BENCH_BATCH=128 python scripts/perf_probe11.py
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


def main():
    from __graft_entry__ import _flagship
    from bcosification_tpu.losses import UniformOffLabelsBCEWithLogitsLoss
    from bcosification_tpu.optim.lr_scheduler_factory import LRSchedulerFactory
    from bcosification_tpu.optim.optimizer_factory import OptimizerFactory
    from bcosification_tpu.training import steps as steps_lib

    net, variables = _flagship(input_size=224, arch="resnet50")
    criterion = UniformOffLabelsBCEWithLogitsLoss()
    schedule = LRSchedulerFactory(
        name="cosineannealinglr", epochs=90, warmup_epochs=0
    ).create(1e-4, steps_per_epoch=5004)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 224, 224, 6), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 1000, size=(B,)), jnp.int32)
    batch = {"image": x, "label": y}

    def loss_fn(params, batch_stats):
        out, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"].astype(jnp.bfloat16),
            train=True,
            mutable=["batch_stats"],
        )
        loss = criterion(out.astype(jnp.float32), batch["label"])
        return loss, mutated["batch_stats"]

    def slope(jitted_loop):
        float(jitted_loop(2))
        float(jitted_loop(10))
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(jitted_loop(2)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(jitted_loop(10)); tb = time.perf_counter() - t0
            per = (tb - ts) / 8
            best = per if best is None else min(best, per)
        return best

    params0, bs0 = variables["params"], variables.get("batch_stats", {})

    # --- fwd only ------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def fwd_loop(n):
        def body(i, carry):
            acc, bs = carry
            loss, bs = loss_fn(params0, bs)
            return acc + loss, bs

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), bs0))
        return acc

    t = slope(fwd_loop)
    print(f"fwd(train)          {t*1e3:6.2f} ms  {B/t:6.0f} img/s", flush=True)

    # --- fwd + bwd -----------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def grad_loop(n):
        def body(i, carry):
            acc, p, bs = carry
            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bs)
            # consume grads with a data dependency (no optimizer)
            p = jax.tree_util.tree_map(lambda a, g: a - 0.0 * g, p, grads)
            return acc + loss, p, bs

        acc, _, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), params0, bs0))
        return acc

    t = slope(grad_loop)
    print(f"fwd+bwd             {t*1e3:6.2f} ms  {B/t:6.0f} img/s", flush=True)

    # --- optimizer ladders ---------------------------------------------------
    def step_loop(train_step, state):
        @partial(jax.jit, static_argnums=(0,))
        def loop(n):
            def body(i, st):
                st, _ = train_step(st, batch)
                return st

            final = jax.lax.fori_loop(0, n, body, state)
            return sum(
                leaf.astype(jnp.float32).sum()
                for leaf in jax.tree_util.tree_leaves(final.params)
            )

        return loop

    def build(name, opt, use_agc, ema_decay, with_ema):
        tx = opt
        ts = steps_lib.make_train_step(
            net, criterion, tx, use_agc=use_agc, ema_decay=ema_decay,
            ema_steps=32, donate=False, amp=True,
        )
        st = steps_lib.create_train_state(variables, tx, with_ema=with_ema)
        t = slope(step_loop(ts, st))
        print(f"{name:<18s}  {t*1e3:6.2f} ms  {B/t:6.0f} img/s", flush=True)

    adam = OptimizerFactory(name="Adam", lr=1e-4).create(schedule)
    build("+adam", adam, False, None, False)
    build("+adam+agc", adam, True, None, False)
    build("+adam+agc+ema=full", adam, True, 0.9998, True)
    sgd = optax.sgd(1e-4)
    build("full-but-sgd", sgd, True, 0.9998, True)


if __name__ == "__main__":
    main()

"""Probe 12: space-to-depth stem on the TRAINING step (autodiff path).

PERF.md round 3 measured s2d neutral on the fwd+explain headline — expected,
because the hand-scheduled fast pass already phase-decomposes the stem
backward. The TRAINING step runs pure autodiff, where perf_probe6 measured
the dilated stem dx at ~1.9 ms — the case s2d is supposed to fix. This probe
interleaves BCOS_S2D_STEM=0/1 within ONE process (within-process slope
timing is stable; across processes throughput is bimodal, CLAUDE.md), with a
fresh trace per variant (the gate is read at trace time).

Run on TPU: python scripts/perf_probe12.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.getenv("BENCH_BATCH", "128"))


def build_loop():
    from __graft_entry__ import _flagship
    from bcosification_tpu.losses import UniformOffLabelsBCEWithLogitsLoss
    from bcosification_tpu.optim.lr_scheduler_factory import LRSchedulerFactory
    from bcosification_tpu.optim.optimizer_factory import OptimizerFactory
    from bcosification_tpu.training import steps as steps_lib

    net, variables = _flagship(input_size=224, arch="resnet50")
    schedule = LRSchedulerFactory(
        name="cosineannealinglr", epochs=90, warmup_epochs=0
    ).create(1e-4, steps_per_epoch=5004)
    tx = OptimizerFactory(name="Adam", lr=1e-4).create(schedule)
    train_step = steps_lib.make_train_step(
        net, UniformOffLabelsBCEWithLogitsLoss(), tx,
        use_agc=True, ema_decay=0.9998, ema_steps=32, donate=False, amp=True,
    )
    state = steps_lib.create_train_state(variables, tx, with_ema=True)

    @partial(jax.jit, static_argnums=(2,))
    def loop(state, batch, n):
        def body(i, st):
            st, _ = train_step(st, batch)
            return st

        final = jax.lax.fori_loop(0, n, body, state)
        return sum(
            leaf.astype(jnp.float32).sum()
            for leaf in jax.tree_util.tree_leaves(final.params)
        )

    return loop, state


def measure(loop, state, batch, n_small=2, n_big=12):
    float(loop(state, batch, 1))  # compile small path? (n static: compile both)
    float(loop(state, batch, n_small))
    float(loop(state, batch, n_big))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(state, batch, n_small)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(state, batch, n_big)); tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    return best


def main():
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.random((B, 224, 224, 6), dtype=np.float32)),
        "label": jnp.asarray(rng.integers(0, 1000, size=(B,)), jnp.int32),
    }
    results = {"0": [], "1": []}
    for rep in range(3):
        for variant in ("0", "1"):
            os.environ["BCOS_S2D_STEM"] = variant
            loop, state = build_loop()  # fresh trace under the flipped gate
            ms = measure(loop, state, batch) * 1e3
            results[variant].append(ms)
            print(f"rep {rep} s2d={variant}: {ms:.2f} ms "
                  f"({B / ms * 1e3:.0f} img/s)", flush=True)
    for v, label in (("0", "s2d off"), ("1", "s2d on ")):
        ms = min(results[v])
        print(f"{label}: best {ms:.2f} ms = {B / ms * 1e3:.0f} img/s/chip "
              f"(all: {[round(x, 2) for x in results[v]]})")


if __name__ == "__main__":
    main()

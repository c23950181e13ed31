"""Training-step throughput benchmark (supervised CNN bcosification recipe).

The headline bench (bench.py) measures fwd+explain; this one measures the
production TRAINING step — B-cosified ResNet-50, UniformOffLabels BCE, Adam
+ cosine schedule, AGC, EMA, bf16 AMP — on one chip, with the same
fori-loop slope methodology (CLAUDE.md: block_until_ready is not
trustworthy through the axon tunnel).

Reference recipe being timed: 64 img/GPU x 4 GPUs, ref
`ImageNet/bcosification/experiment_parameters.py:29-39`.

Run on TPU: python scripts/bench_train.py            (bf16 AMP, batch 64)
            BENCH_BATCH=128 python scripts/bench_train.py
            BENCH_AMP=0 python scripts/bench_train.py (fp32 master path)
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.getenv("BENCH_BATCH", "64"))
AMP = os.getenv("BENCH_AMP", "1") == "1"


def main():
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
        net,
        UniformOffLabelsBCEWithLogitsLoss(),
        tx,
        use_agc=True,
        ema_decay=0.9998,
        ema_steps=32,
        donate=False,  # state is carried through the timing loop instead
        amp=AMP,
    )
    state = steps_lib.create_train_state(variables, tx, with_ema=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 224, 224, 6), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 1000, size=(B,)), jnp.int32)
    batch = {"image": x, "label": y}

    @partial(jax.jit, static_argnums=(2,))
    def loop(state, batch, n):
        def body(i, st):
            st, metrics = train_step(st, batch)
            return st
        final = jax.lax.fori_loop(0, n, body, state)
        # return a value that depends on the updated parameters, otherwise
        # XLA dead-code-eliminates the entire training computation
        return sum(
            leaf.astype(jnp.float32).sum()
            for leaf in jax.tree_util.tree_leaves(final.params)
        )

    float(loop(state, batch, 2))
    # window >= ~0.7 s (CLAUDE.md short-window drift): the train step
    # runs ~62 ms/iter -> 14 iters ~ 0.87 s
    n_small, n_big = 2, 14
    float(loop(state, batch, n_big))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(state, batch, n_small)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(state, batch, n_big)); tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    print(
        f"train step (B={B}, amp={'bf16' if AMP else 'fp32'}): "
        f"{best*1e3:.2f} ms = {B/best:.0f} img/s/chip"
    )


if __name__ == "__main__":
    main()

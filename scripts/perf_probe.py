"""Perf probe for the RN50 fwd+explain bench: where does the time go?

Measures (same fori_loop methodology as bench.py):
  - forward-only vs forward+explain throughput
  - batch-size scaling
  - XLA cost analysis (flops / bytes) of the compiled step
Run on TPU: python scripts/perf_probe.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, variables, x, n_small=2, n_big=12):
    float(fn(variables, x, 2))
    float(fn(variables, x, n_big))
    t0 = time.perf_counter()
    float(fn(variables, x, n_small))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(variables, x, n_big))
    t_big = time.perf_counter() - t0
    per_iter = (t_big - t_small) / (n_big - n_small)
    return x.shape[0] / per_iter


def main():
    from __graft_entry__ import _flagship
    from bcosification_tpu.explain.core import dynamic_linear_weights

    net, variables = _flagship(input_size=224, arch="resnet50")

    @partial(jax.jit, static_argnums=(2,))
    def fwd_only(variables, x, n):
        def body(i, carry):
            acc, xx = carry
            logits = net.apply(variables, xx, train=False, explain=False)
            acc = acc + logits.mean().astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    @partial(jax.jit, static_argnums=(2,))
    def fwd_explain(variables, x, n):
        def body(i, carry):
            acc, xx = carry

            def f(inp):
                return net.apply(variables, inp, train=False, explain=True)

            logits, sel, w = dynamic_linear_weights(f, xx)
            cmap = (xx * w).sum(-1)
            acc = acc + (cmap.mean() + logits.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    rng = np.random.default_rng(0)
    for batch in (64, 128, 256):
        x = jnp.asarray(rng.random((batch, 224, 224, 6), dtype=np.float32)).astype(
            jnp.bfloat16
        )
        f_ips = timed(fwd_only, variables, x)
        e_ips = timed(fwd_explain, variables, x)
        print(f"batch={batch}: fwd-only {f_ips:.0f} img/s, fwd+explain {e_ips:.0f} img/s")

    # cost analysis for batch 128 explain step (single iteration, no loop)
    x = jnp.asarray(rng.random((128, 224, 224, 6), dtype=np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def one_step(variables, x):
        def f(inp):
            return net.apply(variables, inp, train=False, explain=True)

        logits, sel, w = dynamic_linear_weights(f, x)
        return (x * w).sum(-1).mean() + logits.mean()

    try:
        c = one_step.lower(variables, x).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = c.get("flops", float("nan"))
        bytes_ = c.get("bytes accessed", float("nan"))
        print(f"cost: {flops/1e9:.1f} GFLOP/step ({flops/128/1e9:.2f} GFLOP/img), "
              f"{bytes_/1e9:.2f} GB accessed ({bytes_/128/1e6:.1f} MB/img)")
        # v5e: ~197 bf16 TFLOP/s, ~819 GB/s HBM
        print(f"  roofline: compute-bound floor {flops/197e12*1e3:.1f} ms, "
              f"bandwidth floor {bytes_/819e9*1e3:.1f} ms "
              f"(measured ~{128/4120*1e3:.1f} ms)")
    except Exception as e:
        print(f"cost analysis unavailable: {e}")


if __name__ == "__main__":
    main()

"""Probe 7: depth bisection of fwd vs fwd+explain time (batch 128 bf16).

Builds truncated B-cos RN50s (stem+layer1, +layer2, ...) and times each, so
the per-stage forward and backward costs can be read off as differences.

Run on TPU: python scripts/perf_probe7.py
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


def build(layers):
    from __graft_entry__ import _flagship

    return _flagship(input_size=224, arch="resnet50",
                     layers=("bottleneck", layers))


def make_fwd(net):
    @partial(jax.jit, static_argnums=(2,))
    def f(variables, x, n):
        def body(i, carry):
            acc, xx = carry
            logits = net.apply(variables, xx, train=False, explain=False)
            acc = acc + logits.mean().astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]
    return f


def make_explain(net):
    from bcosification_tpu.explain.core import dynamic_linear_weights

    @partial(jax.jit, static_argnums=(2,))
    def f(variables, x, n):
        def body(i, carry):
            acc, xx = carry
            def g(inp):
                return net.apply(variables, inp, train=False, explain=True)
            logits, sel, w = dynamic_linear_weights(g, xx)
            acc = acc + ((xx * w).sum(-1).mean() + logits.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]
    return f


def slope(jitted, args, n_small=2, n_big=12):
    float(jitted(*args, n_small))
    float(jitted(*args, n_big))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(jitted(*args, n_small)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jitted(*args, n_big)); tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 224, 224, 6), dtype=np.float32), jnp.bfloat16)
    prev_f = prev_e = 0.0
    for layers in [(3,), (3, 4), (3, 4, 6), (3, 4, 6, 3)]:
        net, variables = build(layers)
        tf = slope(make_fwd(net), (variables, x))
        te = slope(make_explain(net), (variables, x))
        print(f"layers {str(layers):14s} fwd {tf*1e3:6.2f} ms (Δ{(tf-prev_f)*1e3:6.2f})   "
              f"fwd+explain {te*1e3:6.2f} ms (Δ{(te-prev_e)*1e3:6.2f})   "
              f"bwd {(te-tf)*1e3:6.2f} ms")
        prev_f, prev_e = tf, te


if __name__ == "__main__":
    main()

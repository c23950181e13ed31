"""Probe 15: patch norm folded into the SAME conv call (BCOS_AUG_NORM).

The last unmeasured structural idea (VERDICT r3 / docs/PERF.md): the
fwd+explain step is kernel-boundary-bound, so replacing every per-layer
{conv, reduce_window} kernel PAIR with ONE augmented conv (input gains a
channel carrying sum_c x_c^2, weight gains a ones output column whose output
channel is exactly ||x_patch||^2) trades ~(1/Cin + 1/Cout) extra MACs + TPU
lane padding on C+1-channel tensors against one fewer kernel boundary and
one fewer full activation read per layer.

Interleaves BCOS_AUG_NORM=0/1 within ONE process (within-process slope
timing is stable; across processes throughput is bimodal — CLAUDE.md), with
a fresh trace per variant (the gate is read at trace time). Slope windows
follow bench.py (n_big=24 ≈ 0.75 s).

Run on TPU: python scripts/perf_probe15.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.getenv("BENCH_BATCH", "128"))


def build():
    import bench

    net, variables = bench.build()
    fn = bench.make_bench_fn(net, 0)
    return fn, variables


def measure(fn, variables, x, n_small=2, n_big=24):
    float(fn(variables, x, n_small))
    float(fn(variables, x, n_big))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(fn(variables, x, n_small)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(fn(variables, x, n_big)); tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    return best


def main():
    x = jnp.asarray(
        np.random.default_rng(0).random((B, 224, 224, 6), dtype=np.float32)
    ).astype(jnp.bfloat16)
    results = {"0": [], "1": []}
    for rep in range(3):
        for variant in ("0", "1"):
            os.environ["BCOS_AUG_NORM"] = variant
            fn, variables = build()  # fresh trace under the flipped gate
            ms = measure(fn, variables, x) * 1e3
            results[variant].append(ms)
            print(f"rep {rep} aug={variant}: {ms:.2f} ms "
                  f"({B / ms * 1e3:.0f} img/s)", flush=True)
    for v, label in (("0", "aug off"), ("1", "aug on ")):
        ms = min(results[v])
        print(f"{label}: best {ms:.2f} ms = {B / ms * 1e3:.0f} img/s/chip "
              f"(all: {[round(x, 2) for x in results[v]]})")


if __name__ == "__main__":
    main()

"""Probe 10: is the bimodal cross-process throughput (~4100 vs ~4600 img/s
for the identical bench.py binary, docs/PERF.md round 3) a COMPILE artifact
or MACHINE state?

Within one process, alternate:
  (a) re-measure the SAME compiled executable          -> machine-state signal
  (b) jax.clear_caches(), recompile fresh, re-measure  -> compile-nondeterminism
                                                          signal

If (b) varies while (a) is stable, the remote axon compiler autotunes
nondeterministically and the fast schedule could be pinned (actionable).
If both move together, it's tunnel/machine state (not actionable).

Run on TPU: python scripts/perf_probe10.py [n_rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import bench

BATCH = bench.BATCH


def main():
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    net, variables = bench.build()
    x = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 224, 224, 6), dtype=np.float32)
    ).astype(jnp.bfloat16)

    def measure(bench_n, n_small=2, n_big=12):
        float(bench_n(variables, x, n_small))
        float(bench_n(variables, x, n_big))
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(bench_n(variables, x, n_small)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(bench_n(variables, x, n_big)); tb = time.perf_counter() - t0
            per = (tb - ts) / (n_big - n_small)
            best = per if best is None else min(best, per)
        return BATCH / best

    bench_n = bench.make_bench_fn(net, 0)
    for r in range(n_rounds):
        same = measure(bench_n)  # same executable, fresh timing
        print(f"round {r}: same-executable  {same:7.0f} img/s", flush=True)
        jax.clear_caches()
        bench_n = bench.make_bench_fn(net, 0)  # fresh trace + remote compile
        fresh = measure(bench_n)
        print(f"round {r}: fresh-compile    {fresh:7.0f} img/s", flush=True)


if __name__ == "__main__":
    main()

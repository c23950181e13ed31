"""Probe 13: batch-size scaling of the headline fwd+explain throughput.

BASELINE.json's north star is img/s/chip with no pinned batch size; bench.py
has always used 128. If larger batches amortise per-kernel ramp overheads
(~107 conv kernels/iteration at ~31 ms), a bigger serving batch is a
legitimate throughput lever. This probe measures B in {64, 128, 256, 512}
INTERLEAVED within one process (within-process slope timing is stable;
across processes throughput is bimodal — docs/PERF.md), window length scaled
to keep every slope window >= ~0.7 s (short windows drift ~20%).

Run on TPU: python scripts/perf_probe13.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build, make_bench_fn

BATCHES = [int(b) for b in os.getenv("PROBE13_BATCHES", "64,128,256,512").split(",")]
REPS = int(os.getenv("PROBE13_REPS", "3"))


def main():
    net, variables = build()
    bench_n = make_bench_fn(net, 0)
    rng = np.random.default_rng(0)

    xs, windows = {}, {}
    for B in BATCHES:
        xs[B] = jnp.asarray(
            rng.random((B, 224, 224, 6), dtype=np.float32)
        ).astype(jnp.bfloat16)
        # keep the big window >= ~0.75 s assuming ~31 ms per 128 images
        n_big = max(8, int(round(24 * 128 / B)))
        windows[B] = (2, n_big)

    # compile everything up front so the interleaved loop is measurement-only
    for B in BATCHES:
        n_small, n_big = windows[B]
        float(bench_n(variables, xs[B], n_small))
        float(bench_n(variables, xs[B], n_big))
        print(f"compiled B={B} (windows {n_small}/{n_big})", flush=True)

    results = {B: [] for B in BATCHES}
    for rep in range(REPS):
        for B in BATCHES:
            n_small, n_big = windows[B]
            t0 = time.perf_counter()
            float(bench_n(variables, xs[B], n_small))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(bench_n(variables, xs[B], n_big))
            tb = time.perf_counter() - t0
            per = (tb - ts) / (n_big - n_small)
            results[B].append(B / per)
            print(f"rep {rep} B={B}: {per * 1e3:.2f} ms/iter = "
                  f"{B / per:.0f} img/s", flush=True)

    print("\nbatch-size scaling (best of reps):")
    for B in BATCHES:
        best = max(results[B])
        print(f"  B={B:4d}: {best:7.0f} img/s/chip "
              f"(all: {[round(r) for r in results[B]]})")


if __name__ == "__main__":
    main()

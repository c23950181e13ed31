"""Probe 16: decompose the kernel-boundary cost — fixed per-kernel overhead
vs bytes-at-bandwidth — and correlate it with the session's throughput mode.

Motivation (docs/PERF.md): the fwd+explain step is "kernel-granularity
serialisation at the HBM roofline" — ~8.5 ms of the backward's elementwise
stage is attributed to boundary traffic. But a "boundary" costs two things
that were never separated:

  per-kernel time = FIXED (per-section sequencing/dispatch)
                  + BYTES / BANDWIDTH (the write+read of the tensor)

If FIXED dominates at RN50 activation sizes, kernel-COUNT reduction beats
byte reduction (and the slow/fast bimodal mode may simply be two dispatch
rates, which no XLA-level change can touch). If BYTES dominates, the
roofline story stands as written.

Method (one process, so all numbers share the session's mode):
  1. headline fwd+explain in-process -> this session's mode (img/s).
  2. chains of K elementwise kernels split by lax.optimization_barrier
     (each reads+writes one bf16 tensor of S elements). Per-kernel time at
     size S = slope over K: (t_iter(K=128) - t_iter(K=16)) / 112 — loop
     overhead cancels. The smallest-S value is FIXED; then
     (per_kernel(S) - FIXED) / (4S bytes) is the effective stream rate.
  3. ENTRY-level kernel count of the compiled headline step, so
     FIXED * n_kernels can be compared against the measured step time.

Run on TPU: python scripts/perf_probe16.py
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import bench

BATCH = bench.BATCH
MIN_WINDOW_S = 0.75  # short windows drift up to ~20% on the tunnel (PERF.md)


def timed_call(fn, n):
    t0 = time.perf_counter()
    float(fn(n))
    return time.perf_counter() - t0


def per_iter_time(fn, reps=3, n_small=2):
    """Per-iteration seconds of jitted fn(n): two-length slope with the big
    window auto-sized to >= MIN_WINDOW_S, min over reps."""
    float(fn(n_small))  # compile small
    t_rough = timed_call(fn, n_small) / n_small
    n_big = n_small + max(4, int(MIN_WINDOW_S / max(t_rough, 1e-9)))
    n_big = min(n_big, 4096)
    float(fn(n_big))  # compile big
    best = None
    for _ in range(reps):
        ts = timed_call(fn, n_small)
        tb = timed_call(fn, n_big)
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    return best


def make_chain(k_kernels: int, n_elems: int):
    """Jitted fn(n): n dependent iterations, each a chain of k_kernels
    elementwise kernels separated by optimization_barrier (unfusable)."""

    @partial(jax.jit, static_argnums=(1, 2))
    def run(x, n, k):
        def body(i, carry):
            acc, xx = carry
            a = (1.0 + 1e-7 * acc).astype(xx.dtype)
            for _ in range(k):
                xx = xx * a + jnp.bfloat16(1e-7)
                xx = jax.lax.optimization_barrier(xx)
            acc = acc + xx[0].astype(jnp.float32)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    x = jnp.zeros((n_elems,), jnp.bfloat16)
    return lambda n: run(x, n, k_kernels)


def make_chain3(k_kernels: int, n_elems: int):
    """Jitted fn(n): like make_chain, but each kernel reads TWO distinct
    live tensors and writes a third (x_j = x_{j-1}*a + x_{j-2}*c), so three
    S-sized buffers are live at every boundary. With 3S > VMEM (128 MiB on
    v5e) the chain cannot stay on-chip — this measures the true HBM
    kernel-boundary streaming rate (3 transfers of S per kernel), immune to
    algebraic folding (two-term recurrence, barriers between kernels)."""

    @partial(jax.jit, static_argnums=(2, 3))
    def run(x, y, n, k):
        def body(i, carry):
            acc, x0, x1 = carry
            a = (1.0 + 1e-7 * acc).astype(x0.dtype)
            c = (1.0 - 1e-7 * acc).astype(x0.dtype)
            for _ in range(k):
                x2 = x1 * a + x0 * c
                x2 = jax.lax.optimization_barrier(x2)
                x0, x1 = x1, x2
            acc = acc + x1[0].astype(jnp.float32)
            return acc, x0, x1

        acc, _, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x, y))
        return acc

    x = jnp.zeros((n_elems,), jnp.bfloat16)
    y = jnp.ones((n_elems,), jnp.bfloat16)
    return lambda n: run(x, y, n, k_kernels)


def entry_kernel_count(compiled) -> dict:
    """Count top-level ops in the ENTRY computation of optimized HLO."""
    hlo = compiled.as_text()
    m = re.search(r"^ENTRY [^{]*\{\n(.*?)^\}", hlo, re.S | re.M)
    if not m:
        return {}
    counts = {}
    for line in m.group(1).splitlines():
        s = line.strip()
        mm = re.match(r"(?:ROOT )?\S+ = \S+ ([a-z][a-z0-9\-]*)\(", s)
        if not mm:
            continue
        op = mm.group(1)
        counts[op] = counts.get(op, 0) + 1
    return counts


def main():
    # ---- 1. session mode: headline fwd+explain, in-process -----------------
    net, variables = bench.build()
    x = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 224, 224, 6), dtype=np.float32)
    ).astype(jnp.bfloat16)
    bench_n = bench.make_bench_fn(net, 0)
    per_iter = per_iter_time(lambda n: bench_n(variables, x, n))
    print(f"headline: {per_iter*1e3:7.2f} ms/step  {BATCH/per_iter:7.0f} img/s "
          f"(session mode)", flush=True)

    # ---- 3. kernel count of that step (while-body of the n=1 loop) ---------
    interesting = {}
    try:
        compiled = jax.jit(
            lambda v, xx: bench_n(v, xx, 1)
        ).lower(variables, x).compile()
        hlo = compiled.as_text()
        # the step body is the fori_loop body computation, not ENTRY: count
        # top-level ops in the largest non-ENTRY computation
        best_counts, best_total = {}, 0
        for m in re.finditer(r"^(?:ENTRY )?%?[\w\.\-]+ [^{\n]*\{\n(.*?)^\}",
                             hlo, re.S | re.M):
            counts = {}
            for line in m.group(1).splitlines():
                s = line.strip()
                mm = re.match(r"(?:ROOT )?\S+ = \S+ ([a-z][a-z0-9\-]*)\(", s)
                if mm:
                    counts[mm.group(1)] = counts.get(mm.group(1), 0) + 1
            real = {
                k: v for k, v in counts.items()
                if k in ("fusion", "convolution", "reduce-window", "copy",
                         "reduce", "custom-call", "all-reduce", "transpose",
                         "dot", "select-and-scatter")
            }
            tot = sum(real.values())
            if tot > best_total:
                best_total, best_counts = tot, real
        interesting = best_counts
        print(f"step-body kernels: total={best_total}")
        for k, v in sorted(interesting.items(), key=lambda kv: -kv[1]):
            print(f"  {k:24s} n={v}")
    except Exception as e:
        print(f"kernel census failed: {e}")

    # ---- 2. per-kernel boundary cost vs tensor size -------------------------
    # 1 KiB (pure fixed), 1.5 MiB (late act), 12.25 MiB (mid act),
    # 49 MiB (batch128 56x56x64 bf16 = layer1 act)
    sizes = [512, 784 * 1024, 6_422_528, 25_690_112]
    k_lo, k_hi = 16, 128
    print("\nchain probe: per-kernel time by tensor size (bf16, 1 read + 1 write)")
    fixed_s = None
    for s_el in sizes:
        t_lo = per_iter_time(make_chain(k_lo, s_el), reps=2)
        t_hi = per_iter_time(make_chain(k_hi, s_el), reps=2)
        pk = (t_hi - t_lo) / (k_hi - k_lo)
        if fixed_s is None:
            fixed_s = pk
        bytes_per_kernel = 2 * 2 * s_el  # bf16 read + write
        bw = (bytes_per_kernel / max(pk - fixed_s, 1e-12) / 1e9
              if pk > fixed_s * 1.05 else float("nan"))
        print(f"  S={s_el*2/2**20:8.2f} MiB  per-kernel {pk*1e6:8.2f} us  "
              f"eff-stream {bw:7.0f} GB/s", flush=True)

    n_kernels = sum(interesting.values())
    if fixed_s is not None and n_kernels:
        print(f"\nfixed-overhead budget: {fixed_s*1e6:.2f} us/kernel x "
              f"{n_kernels} kernels = {fixed_s*n_kernels*1e3:.2f} ms "
              f"of the {per_iter*1e3:.2f} ms step")

    # ---- 2b. spilled boundaries: 3 live buffers, working set vs VMEM -------
    # 12.25 MiB x3 = 37 MiB (fits VMEM) | 49 MiB x3 = 147 MiB (spills) |
    # 98 MiB x3 = 294 MiB (fully HBM)
    print("\nchain3 probe: 2-read+1-write kernels, three live buffers")
    for s_el in [6_422_528, 25_690_112, 51_380_224]:
        t_lo = per_iter_time(make_chain3(8, s_el), reps=2)
        t_hi = per_iter_time(make_chain3(32, s_el), reps=2)
        pk = (t_hi - t_lo) / 24
        bytes_per_kernel = 3 * 2 * s_el  # bf16: 2 reads + 1 write
        print(f"  S={s_el*2/2**20:8.2f} MiB (live {3*s_el*2/2**20:6.1f} MiB)  "
              f"per-kernel {pk*1e6:8.2f} us  eff-stream "
              f"{bytes_per_kernel/max(pk,1e-12)/1e9:7.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()

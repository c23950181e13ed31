"""Probe 17: int8 conv throughput vs bf16 on this toolchain.

Probe 16 closed the boundary question: the fwd+explain step's cost is conv
operand/output traffic already streaming at ~87% of HBM peak, plus MXU time.
The one hardware lever never measured is precision below bf16: v5e's MXU
runs int8 x int8 -> int32 at 2x the bf16 MAC rate, and int8 operands halve
the HBM bytes per conv boundary. If XLA lowers `lax.conv_general_dilated`
with int8 operands at anywhere near that rate, a quantized SERVING forward
(opt-in, tolerance-documented — the headline bench keeps reference-exact
bf16 semantics) could raise the fwd-only / mixed-serving points
(scripts/bench_serving.py) well past their current 12.2k / 10.0k img/s.

Method: interleaved within one process (all numbers share the tunnel mode).
For each RN50-representative NHWC conv shape, a jitted fori_loop of n
dependent iterations:

  bf16: y = conv(x, w)                        ; x' = y * 2^-7 (cast bf16)
  int8: y = conv(x, w, preferred=int32)       ; x' = y >> 7  (cast int8)

Cin == Cout and SAME padding so x' feeds the next iteration. Two-length
slope timing (windows >= 0.75 s), min over reps. Reports ms/conv and
effective TMAC/s per variant.

Run on TPU: python scripts/perf_probe17.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

MIN_WINDOW_S = 0.75
REPS = int(os.getenv("PROBE17_REPS", "3"))
BATCH = int(os.getenv("PROBE17_BATCH", "128"))

# (label, H, C, K): stride-1 SAME conv, Cin=Cout=C, BATCH x H x H x C input.
SHAPES = [
    ("layer1 56x56x64 3x3", 56, 64, 3),
    ("layer2 28x28x128 3x3", 28, 128, 3),
    ("layer3 14x14x256 3x3", 14, 256, 3),
    ("layer4 7x7x512 3x3", 7, 512, 3),
    ("head 7x7x2048 1x1", 7, 2048, 1),
]

DN = ("NHWC", "HWIO", "NHWC")


def make_loop(h, c, k, dtype):
    pad = "SAME"

    if dtype == "bf16":
        @partial(jax.jit, static_argnums=(2,))
        def run(x, w, n):
            def body(i, carry):
                acc, xx = carry
                y = lax.conv_general_dilated(
                    xx, w, (1, 1), pad, dimension_numbers=DN)
                xx2 = (y * jnp.bfloat16(2.0 ** -7)).astype(jnp.bfloat16)
                return acc + y[0, 0, 0, 0].astype(jnp.float32), xx2
            acc, _ = lax.fori_loop(
                0, n, body, (jnp.float32(0.0), x))
            return acc
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, h, h, c)),
            dtype=jnp.bfloat16)
        w = jnp.asarray(
            np.random.default_rng(1).standard_normal((k, k, c, c)) * 0.02,
            dtype=jnp.bfloat16)
    else:
        @partial(jax.jit, static_argnums=(2,))
        def run(x, w, n):
            def body(i, carry):
                acc, xx = carry
                y = lax.conv_general_dilated(
                    xx, w, (1, 1), pad, dimension_numbers=DN,
                    preferred_element_type=jnp.int32)
                xx2 = lax.shift_right_arithmetic(y, 7).astype(jnp.int8)
                return acc + y[0, 0, 0, 0].astype(jnp.float32), xx2
            acc, _ = lax.fori_loop(
                0, n, body, (jnp.float32(0.0), x))
            return acc
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(-4, 5, (BATCH, h, h, c)), dtype=jnp.int8)
        w = jnp.asarray(rng.integers(-2, 3, (k, k, c, c)), dtype=jnp.int8)

    return run, x, w


def per_iter(run, x, w, reps=REPS):
    n_small = 2
    float(run(x, w, n_small))  # compile small
    t0 = time.perf_counter()
    float(run(x, w, n_small))
    t_rough = (time.perf_counter() - t0) / n_small
    n_big = n_small + max(8, int(MIN_WINDOW_S / max(t_rough, 1e-9)))
    n_big = min(n_big, 8192)
    float(run(x, w, n_big))  # compile big
    pers = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, w, n_small))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(x, w, n_big))
        tb = time.perf_counter() - t0
        pers.append((tb - ts) / (n_big - n_small))
    # a tunnel stall on the small window can push one slope negative —
    # the median over reps is robust to a single outlier either way
    pers.sort()
    return pers[len(pers) // 2], pers


def main():
    print(f"devices: {jax.devices()}", flush=True)
    loops = {}
    for label, h, c, k in SHAPES:
        for dt in ("bf16", "int8"):
            try:
                run, x, w = make_loop(h, c, k, dt)
                float(run(x, w, 2))  # compile / support check
                loops[(label, dt)] = (run, x, w)
                print(f"compiled {label} [{dt}]", flush=True)
            except Exception as e:  # noqa: BLE001 — report unsupported combos
                print(f"UNSUPPORTED {label} [{dt}]: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    print()
    results = {}
    for label, h, c, k in SHAPES:
        macs = BATCH * h * h * c * c * k * k  # stride-1 SAME
        for dt in ("bf16", "int8"):
            key = (label, dt)
            if key not in loops:
                continue
            per, pers = per_iter(*loops[key])
            results[key] = per
            print(f"{label:24s} [{dt}]: {per * 1e3:8.3f} ms/conv  "
                  f"{macs / per / 1e12:6.2f} TMAC/s  "
                  f"(reps ms: {[round(p * 1e3, 3) for p in pers]})",
                  flush=True)
        b, i = results.get((label, "bf16")), results.get((label, "int8"))
        if b and i:
            print(f"{label:24s} int8 speedup: {b / i:.2f}x", flush=True)


if __name__ == "__main__":
    main()

"""Probe 18: end-to-end int8 serving forward (BCOS_INT8=1) vs bf16.

Probe 17 measured 2.2-2.9x per-conv int8 speedups on the deep RN50 shapes
(and ~1x on the spatially-large layer1). This probe measures the shipped
dispatch end-to-end: the flagship RN50 b=2 forward (the serving fwd-only
shape, bench_serving's 12.2k img/s point), INTERLEAVED bf16/int8 within one
process (fresh trace per variant — the BCOS_INT8 gate is read at trace
time; the tunnel mode is per-process, so interleaving is required for any
sub-10% claim — docs/PERF.md).

Also prints an accuracy proxy: top-1 agreement + logit relative error of
the quantized forward vs bf16 on the same batch.

Run on TPU: python scripts/perf_probe18.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from scripts.bench_serving import make_fwd_fn, slope

REPS = int(os.getenv("PROBE18_REPS", "3"))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    net, variables = bench.build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((bench.BATCH, 224, 224, 6), dtype=np.float32)
    ).astype(jnp.bfloat16)

    # The BCOS_INT8 gate is read at TRACE time, and jit caches per (fn, n):
    # BOTH window lengths (n=2 and n_big=72) must be compiled per variant
    # while the env is set for that variant, or the later slope() call would
    # trace the big window under whatever env happens to be current
    # (ADVICE r4: this exact bug invalidated the round-4 A/B).
    n_small, n_big = 2, 72
    fns = {}
    # this probe is the ALL-conv int8 A/B; selective quantization (the
    # shipped default, BCOS_INT8_MIN_CH=128) is probe19's subject
    os.environ["BCOS_INT8_MIN_CH"] = "0"
    for variant in ("bf16", "int8"):
        os.environ["BCOS_INT8"] = "1" if variant == "int8" else "0"
        fns[variant] = make_fwd_fn(net)  # fresh trace per variant
        t0 = time.perf_counter()
        float(fns[variant](variables, x, n_small))
        float(fns[variant](variables, x, n_big))
        print(f"compiled {variant} n={n_small},{n_big} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # Accuracy proxy on one small batch, compared at the PRE-LOGIT features
    # (model.fc output). At the logits the comparison is VACUOUS for this
    # random-init flagship: the LogitLayer adds log(1/999) ~= -6.9, whose
    # bf16 ULP (0.03) swallows the tiny random-init fc outputs — int8 and
    # bf16 logits come out bit-identical even though 169/176 intermediates
    # differ (measured round 5, docs/PERF.md int8 section). The feature
    # comparison is the honest proxy; trained-weight serving should use the
    # release-weights harness instead.
    xp = x[:8]

    def feats(env):
        os.environ["BCOS_INT8"] = env
        _, mods = jax.jit(
            lambda v, xx: net.apply(
                v, xx, train=False, capture_intermediates=True
            )
        )(variables, xp)
        return np.asarray(
            mods["intermediates"]["model"]["fc"]["__call__"][0], np.float32
        )

    ref = feats("0")
    q = feats("1")
    agree = float(np.mean(ref.argmax(-1) == q.argmax(-1)))
    # NOTE: divide by the true norm, floored far below any real feature
    # scale. The random-init flagship's fc features are ~1e-19 (contraction,
    # CLAUDE.md), so an absolute 1e-12 floor would swamp the denominator and
    # print rel-L2 ~ 0 for a 7.5% error (r5: this exact bug).
    rel = float(np.linalg.norm(q - ref) / max(np.linalg.norm(ref), 1e-30))
    print(f"pre-logit feature argmax agreement: {agree:.4f}  "
          f"feature rel-L2 err: {rel:.3e}", flush=True)

    results = {v: [] for v in fns}
    for rep in range(REPS):
        for variant in ("bf16", "int8"):
            # defensive: every executable slope() touches is already
            # compiled above, but keep the env consistent with the variant
            # in case of cache eviction / fresh traces
            os.environ["BCOS_INT8"] = "1" if variant == "int8" else "0"
            per = slope(fns[variant], variables, x, n_small, n_big)
            results[variant].append(bench.BATCH / per)
            print(f"rep {rep} {variant}: {per * 1e3:.3f} ms/iter = "
                  f"{bench.BATCH / per:.0f} img/s", flush=True)

    print("\nfwd-only serving throughput (median of reps):")
    for variant, vals in results.items():
        vals.sort()
        print(f"  {variant}: {vals[len(vals) // 2]:.0f} img/s "
              f"(all: {[round(v) for v in vals]})")
    med = {v: sorted(r)[len(r) // 2] for v, r in results.items()}
    print(f"int8 speedup: {med['int8'] / med['bf16']:.3f}x")


if __name__ == "__main__":
    main()

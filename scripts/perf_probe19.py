"""Probe 19: SELECTIVE int8 serving (BCOS_INT8_MIN_CH) vs all-conv int8 vs bf16.

Probe 17 measured per-conv int8 wins of 1.66-2.02x on the deep RN50 shapes
but a 0.82x LOSS on the spatially-large/small-channel layer1; probe 18
measured the all-conv int8 forward 0.967x end-to-end (a 3.3% loss). The
remaining configuration is selective quantization: quantize only convs
whose operand channel count is >= BCOS_INT8_MIN_CH, keeping the losing
layer1/stem shapes in exact bf16. min_ch=128 excludes the stem (6->64)
and every layer1 bottleneck operand (min 64 ch) while keeping layer2+ and
the head — exactly probe17's win/lose partition.

Same harness discipline as probe18: fresh trace per variant with the env
set for that variant at BOTH window compiles (the gates are read at trace
time), interleaved variants within one process, 3+ reps (docs/PERF.md
bimodal-mode rule).

Run on TPU: python scripts/perf_probe19.py
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

REPS = int(os.getenv("PROBE19_REPS", "3"))

# variant -> (BCOS_INT8, BCOS_INT8_MIN_CH)
VARIANTS = {
    "bf16": ("0", "0"),
    "int8_all": ("1", "0"),
    "int8_min128": ("1", "128"),
}


def _set_env(variant):
    os.environ["BCOS_INT8"], os.environ["BCOS_INT8_MIN_CH"] = VARIANTS[variant]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    net, variables = bench.build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((bench.BATCH, 224, 224, 6), dtype=np.float32)
    ).astype(jnp.bfloat16)

    n_small, n_big = 2, 72
    fns = {}
    for variant in VARIANTS:
        _set_env(variant)
        fns[variant] = make_fwd_fn(net)  # fresh trace per variant
        t0 = time.perf_counter()
        float(fns[variant](variables, x, n_small))
        float(fns[variant](variables, x, n_big))
        print(f"compiled {variant} n={n_small},{n_big} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # accuracy proxy at the pre-logit features (probe18's rationale: logits
    # are vacuous on the random-init flagship)
    xp = x[:8]

    def feats(variant):
        _set_env(variant)
        _, mods = jax.jit(
            lambda v, xx: net.apply(
                v, xx, train=False, capture_intermediates=True
            )
        )(variables, xp)
        return np.asarray(
            mods["intermediates"]["model"]["fc"]["__call__"][0], np.float32
        )

    ref = feats("bf16")
    for variant in ("int8_all", "int8_min128"):
        q = feats(variant)
        agree = float(np.mean(ref.argmax(-1) == q.argmax(-1)))
        # floor far below any real feature scale: the random-init flagship's
        # fc features are ~1e-19, so an absolute 1e-12 floor would swamp the
        # denominator and print ~0 for a real 7.5% error (probe18, r5)
        rel = float(np.linalg.norm(q - ref) / max(np.linalg.norm(ref), 1e-30))
        print(f"{variant}: pre-logit argmax agreement {agree:.4f}  "
              f"feature rel-L2 {rel:.3e}", flush=True)

    results = {v: [] for v in fns}
    for rep in range(REPS):
        for variant in VARIANTS:
            _set_env(variant)  # defensive; executables already compiled
            per = slope(fns[variant], variables, x, n_small, n_big)
            results[variant].append(bench.BATCH / per)
            print(f"rep {rep} {variant}: {per * 1e3:.3f} ms/iter = "
                  f"{bench.BATCH / per:.0f} img/s", flush=True)

    print("\nfwd-only serving throughput (median of reps):")
    med = {}
    for variant, vals in results.items():
        vals.sort()
        med[variant] = vals[len(vals) // 2]
        print(f"  {variant}: {med[variant]:.0f} img/s "
              f"(all: {[round(v) for v in vals]})")
    for variant in ("int8_all", "int8_min128"):
        print(f"{variant} vs bf16: {med[variant] / med['bf16']:.3f}x")


if __name__ == "__main__":
    main()

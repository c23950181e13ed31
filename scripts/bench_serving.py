"""Serving-blend benchmark: throughput when only a fraction of requests
ask for an explanation map.

The headline bench (bench.py) runs fwd+explain on EVERY image — the
reference's own evaluation shape. Production explainability serving is
usually explain-on-demand: every request gets logits, a fraction p also gets
the W(x) contribution map (audit sampling, user-requested explanations,
active debugging). This script measures, inside ONE process (so all numbers
share the tunnel's per-process throughput mode, docs/PERF.md):

1. fwd-only throughput      (the p=0 end; ~12k img/s on v5e)
2. fwd+explain throughput   (the p=1 end; bench.py's number)
3. a REAL mixed loop at p=1/M (default M=10): one lax.cond-dispatched
   explain iteration per M, inside the same jitted fori_loop slope
   measurement — validating the harmonic blend model rather than assuming it
4. the modeled blend curve  rate(p) = 1 / ((1-p)/r_fwd + p/r_explain)

Prints ONE JSON line. Methodology (dependent-iteration fori_loop slope,
window >= ~0.7 s) is identical to bench.py — see its module docstring.
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench


def make_fwd_fn(net):
    @partial(jax.jit, static_argnums=(2,))
    def fwd_n(variables, x, n):
        def body(i, carry):
            acc, xx = carry
            logits = net.apply(variables, xx, train=False)
            acc = acc + logits.mean().astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    return fwd_n


def make_mixed_fn(net, every: int):
    """One explain iteration per ``every`` requests; the rest fwd-only.

    lax.cond executes only the selected branch per iteration, so the loop
    does real work-proportional serving: (every-1)/every of iterations run
    the forward program, 1/every run fwd+explain.
    """
    import os

    from bcosification_tpu.explain import fast_resnet
    from bcosification_tpu.explain.core import dynamic_linear_weights

    use_fast = os.getenv("BCOS_FAST_EXPLAIN", "1") == "1" and fast_resnet.supports(net)

    @partial(jax.jit, static_argnums=(2,))
    def mixed_n(variables, x, n):
        def explain_branch(xx):
            if use_fast:
                logits, _, w = fast_resnet.fast_dynamic_linear_weights(
                    net, variables, xx
                )
            else:
                logits, _, w = dynamic_linear_weights(
                    lambda inp: net.apply(
                        variables, inp, train=False, explain=True
                    ),
                    xx,
                )
            return ((xx * w).sum(-1).mean() + logits.mean()).astype(jnp.float32)

        def fwd_branch(xx):
            return net.apply(variables, xx, train=False).mean().astype(jnp.float32)

        def body(i, carry):
            acc, xx = carry
            acc = acc + jax.lax.cond(
                i % every == 0, explain_branch, fwd_branch, xx
            )
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    return mixed_n


def slope(fn, variables, x, n_small: int, n_big: int) -> float:
    """Seconds per iteration via the two-point slope (bench.py methodology)."""
    float(fn(variables, x, n_small))  # warm both trace caches
    float(fn(variables, x, n_big))

    def measure():
        t0 = time.perf_counter()
        float(fn(variables, x, n_small))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(variables, x, n_big))
        t_big = time.perf_counter() - t0
        return (t_big - t_small) / (n_big - n_small)

    return min(measure(), measure(), measure())


def blend_rate(p: float, r_fwd: float, r_explain: float) -> float:
    """Throughput serving a stream where fraction p of requests explain.

    Work-conserving single-chip model: time per request is the mix of the
    two program times, so the rate is the weighted harmonic mean."""
    return 1.0 / ((1.0 - p) / r_fwd + p / r_explain) if p > 0 else r_fwd


def main():
    import os

    dtype = (
        jnp.bfloat16 if os.getenv("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    )
    every = int(os.getenv("BENCH_SERVE_EVERY", "10"))
    net, variables = bench.build()
    x = jnp.asarray(
        np.random.default_rng(0).random((bench.BATCH, 224, 224, 6), dtype=np.float32)
    ).astype(dtype)

    # window length >= ~0.7 s per measurement (docs/PERF.md short-window
    # drift): explain ~31 ms/iter -> 24; fwd ~10 ms -> 72; mixed in between
    per_explain = slope(bench.make_bench_fn(net, 0), variables, x, 2, 24)
    per_fwd = slope(make_fwd_fn(net), variables, x, 2, 72)
    # the mixed window must span an integer number of explain periods: both
    # endpoints are multiples of `every`, so the differenced window holds
    # exactly (n_big-n_small)/every explains (r5 review: the old (2, 60)
    # window held 5 explains per 58 iters — an 8.6% mix labeled as 10%,
    # overstating r_mixed by ~2.4%)
    per_mixed = slope(make_mixed_fn(net, every), variables, x, every, 7 * every)

    r_explain = bench.BATCH / per_explain
    r_fwd = bench.BATCH / per_fwd
    r_mixed = bench.BATCH / per_mixed
    p_mixed = 1.0 / every
    modeled = blend_rate(p_mixed, r_fwd, r_explain)
    try:
        platform_version = jax.devices()[0].client.platform_version
    except Exception:  # noqa: BLE001
        platform_version = "unknown"
    print(
        json.dumps(
            {
                "metric": "bcos_rn50_serving_blend",
                "value": round(r_mixed, 2),
                "unit": "img/s/chip",
                "explain_fraction": p_mixed,
                "vs_baseline": round(r_mixed / bench.NORTH_STAR, 4),
                "fwd_only": round(r_fwd, 2),
                "fwd_explain": round(r_explain, 2),
                "modeled_blend": round(modeled, 2),
                "model_error": round(r_mixed / modeled - 1.0, 4),
                "blend_curve": {
                    str(p): round(blend_rate(p, r_fwd, r_explain), 1)
                    for p in (0.0, 0.01, 0.05, 0.1, 0.25, 0.5, 1.0)
                },
                "ts": round(time.time(), 1),
                "platform_version": platform_version,
            }
        )
    )


if __name__ == "__main__":
    main()

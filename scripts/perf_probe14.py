"""Probe 14: per-jit compiler_options sweep on the headline fwd+explain.

CLAUDE.md: `jax.jit(compiler_options=...)` DOES reach the remote axon
compiler (unlike XLA_FLAGS); scoped-vmem knobs measured worse in round 2,
everything else untried. This probe compiles the bench body under a handful
of candidate TPU compiler options and interleaves measurement within ONE
process (within-process slope timing is stable). Unknown option names fail
at compile time and are reported as rejected — that is expected for some
candidates (the valid option namespace is not enumerable through the
tunnel).

Run on TPU: python scripts/perf_probe14.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build

B = int(os.getenv("BENCH_BATCH", "128"))
REPS = int(os.getenv("PROBE14_REPS", "3"))

VARIANTS = [
    ("baseline", None),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("dot_strength_off", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("licm_inflate_8", {"xla_tpu_licm_size_inflation_ratio": "8"}),
    ("async_copy_bw_2x", {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ("async_copy_bw_half", {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"}),
]


def make_fn(net, opts):
    from bcosification_tpu.explain import fast_resnet

    assert fast_resnet.supports(net)

    def bench_n(variables, x, n):
        def body(i, carry):
            acc, xx = carry
            logits, sel, w = fast_resnet.fast_dynamic_linear_weights(
                net, variables, xx
            )
            cmap = (xx * w).sum(-1)
            acc = acc + (cmap.mean() + logits.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    kw = {} if opts is None else {"compiler_options": opts}
    return jax.jit(bench_n, static_argnums=(2,), **kw)


def main():
    net, variables = build()
    x = jnp.asarray(
        np.random.default_rng(0).random((B, 224, 224, 6), dtype=np.float32)
    ).astype(jnp.bfloat16)
    n_small, n_big = 2, 24

    fns = []
    for name, opts in VARIANTS:
        fn = make_fn(net, opts)
        try:
            float(fn(variables, x, n_small))
            float(fn(variables, x, n_big))
        except Exception as e:
            print(f"{name}: REJECTED by compiler ({str(e)[:120]})", flush=True)
            continue
        print(f"compiled {name}", flush=True)
        fns.append((name, fn))

    results = {name: [] for name, _ in fns}
    for rep in range(REPS):
        for name, fn in fns:
            t0 = time.perf_counter()
            float(fn(variables, x, n_small))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fn(variables, x, n_big))
            tb = time.perf_counter() - t0
            per = (tb - ts) / (n_big - n_small)
            results[name].append(B / per)
            print(f"rep {rep} {name}: {per * 1e3:.2f} ms = {B / per:.0f} img/s",
                  flush=True)

    print("\ncompiler_options sweep (best of reps, vs baseline):")
    base = max(results.get("baseline", [1]))
    for name, _ in fns:
        best = max(results[name])
        print(f"  {name:20s}: {best:7.0f} img/s  "
              f"({best / base - 1:+.1%} vs baseline)")


if __name__ == "__main__":
    main()

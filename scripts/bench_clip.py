"""B-cosified CLIP-RN50 throughput: image-tower forward (zeroshot encode)
and text-grounded fwd+explain (the text_localisation workload), batch 128
bf16 on one chip. Slope-timed fori_loop like bench.py.

Run on TPU: python scripts/bench_clip.py
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


def main():
    from bcosification_tpu.experiments.utils import Experiment

    exp = Experiment(
        "ImageNet", "clip_bcosification",
        "resnet_50_clip_b2_noBias_randomResizedCrop_sigLip_ImageNet_bcosification",
    )
    student, variables = exp.get_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((B, 224, 224, 6), dtype=np.float32)
    ).astype(jnp.bfloat16)
    t = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
    t = (t / jnp.linalg.norm(t)).astype(jnp.bfloat16)

    @partial(jax.jit, static_argnums=(3,))
    def fwd_loop(variables, x, t, n):
        def body(i, carry):
            acc, xx = carry
            feats = student.apply(variables, xx, train=False)
            acc = acc + (feats.astype(jnp.float32) ** 2).mean()
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]

    @partial(jax.jit, static_argnums=(3,))
    def explain_loop(variables, x, t, n):
        def body(i, carry):
            acc, xx = carry

            def score(inp):
                feats = student.apply(variables, inp, train=False, explain=True)
                if feats.ndim == 3:  # attn-unpool [B, HW, D]
                    feats = feats.mean(1)
                return (feats @ t.astype(feats.dtype)).sum()

            s, w = jax.value_and_grad(score)(xx)
            acc = acc + s.astype(jnp.float32) + (xx * w).sum().astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]

    # window >= ~0.7 s (CLAUDE.md short-window drift): the fwd leg runs
    # ~13 ms/iter -> 60 iters ~ 0.8 s; explain ~35 ms -> 24 ~ 0.85 s
    def slope(fn, n_small=2, n_big=60):
        float(fn(variables, x, t, n_small))
        float(fn(variables, x, t, n_big))
        best = None
        for _ in range(3):
            t0 = time.perf_counter(); float(fn(variables, x, t, n_small)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fn(variables, x, t, n_big)); tb = time.perf_counter() - t0
            per = (tb - ts) / (n_big - n_small)
            best = per if best is None else min(best, per)
        return best

    from bcosification_tpu.explain import fast_clip

    @partial(jax.jit, static_argnums=(3,))
    def fast_explain_loop(variables, x, t, n):
        def body(i, carry):
            acc, xx = carry
            s, w = fast_clip.fast_text_dlw(student, variables, xx, t)
            acc = acc + s.sum().astype(jnp.float32) + (xx * w).sum().astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]

    tf = slope(fwd_loop)
    print(f"CLIP image-tower forward (B={B}): {tf*1e3:.2f} ms = {B/tf:.0f} img/s/chip")
    te = slope(explain_loop, n_big=24)
    print(f"CLIP text-grounded fwd+explain (B={B}): {te*1e3:.2f} ms = {B/te:.0f} img/s/chip")
    if fast_clip.supports(student):
        tfast = slope(fast_explain_loop, n_big=24)
        print(
            f"CLIP text-grounded fwd+explain FAST (B={B}): {tfast*1e3:.2f} ms = "
            f"{B/tfast:.0f} img/s/chip"
        )


if __name__ == "__main__":
    main()

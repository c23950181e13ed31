"""Probe 6: per-layer conv VJP microbench at RN50 shapes (batch 128 bf16).

Times forward conv vs its dx-VJP for: the 7x7s2 6->64 stem, a 3x3s2 mid conv,
a 3x3s1 conv, a 1x1s1 conv, 1x1s2 downsample. Identifies whether the
backward's 2x slowdown is concentrated in specific shapes (e.g. the 6-channel
stem dx, which pads MXU lanes 6->128).

Run on TPU: python scripts/perf_probe6.py
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

B = int(os.getenv("BENCH_BATCH", "128"))

CASES = [
    # name, (H, W, Cin), (kh, kw, Cout), stride, padding
    ("stem 7x7s2 6->64", (224, 224, 6), (7, 7, 64), 2, 3),
    ("l1 3x3s1 64->64", (56, 56, 64), (3, 3, 64), 1, 1),
    ("l2 3x3s2 128->128", (56, 56, 128), (3, 3, 128), 2, 1),
    ("l3 3x3s1 256->256", (14, 14, 256), (3, 3, 256), 1, 1),
    ("l2 1x1s1 256->128", (28, 28, 256), (1, 1, 128), 1, 0),
    ("ds 1x1s2 256->512", (28, 28, 256), (1, 1, 512), 2, 0),
    ("l4 3x3s1 512->512", (7, 7, 512), (3, 3, 512), 1, 1),
]


def conv(x, w, stride, padding):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    # fori_loop timing with data dependency
    return None


def slope_time(jitted, args, n_small=20, n_big=220):
    float(jitted(*args, n_small))
    float(jitted(*args, n_big))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(jitted(*args, n_small)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jitted(*args, n_big)); tb = time.perf_counter() - t0
        per = (tb - ts) / (n_big - n_small)
        best = per if best is None else min(best, per)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"batch {B} bf16; times are ms per op-instance")
    total_f = total_b = 0.0
    for name, (h, w_, cin), (kh, kw, cout), s, p in CASES:
        x = jnp.asarray(rng.standard_normal((B, h, w_, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.05, jnp.bfloat16)

        @partial(jax.jit, static_argnums=(2,))
        def fwd_loop(x, k, n):
            def body(i, carry):
                acc, xx = carry
                y = conv(xx, k, s, p)
                acc = acc + y.mean().astype(jnp.float32)
                xx = xx + (1e-12 * acc).astype(xx.dtype)
                return acc, xx
            return lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]

        @partial(jax.jit, static_argnums=(2,))
        def bwd_loop(x, k, n):
            def body(i, carry):
                acc, xx = carry
                y, vjp = jax.vjp(lambda a: conv(a, k, s, p), xx)
                (dx,) = vjp(y)  # ct shaped like y
                acc = acc + dx.mean().astype(jnp.float32)
                xx = xx + (1e-12 * acc).astype(xx.dtype)
                return acc, xx
            return lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]

        tf = slope_time(fwd_loop, (x, k))
        tfb = slope_time(bwd_loop, (x, k))
        tb = tfb - tf  # backward-only estimate (bwd_loop does fwd+bwd)
        flop = 2 * B * (h // s) * (w_ // s) * cout * kh * kw * cin / 1e9
        print(f"  {name:22s} fwd {tf*1e3:7.3f} ms ({flop/tf/1e3:6.1f} TF/s)  "
              f"dx {tb*1e3:7.3f} ms ({flop/max(tb,1e-9)/1e3:6.1f} TF/s)")
        total_f += tf
        total_b += tb
    print(f"  sum of cases: fwd {total_f*1e3:.2f} ms, dx {total_b*1e3:.2f} ms")


if __name__ == "__main__":
    main()

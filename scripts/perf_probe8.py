"""Probe 8 (round 2): ablation of the explain step's cost structure.

- b=2 default: the benchmark config.
- b=1: same architecture with the dynamic-linear scaling compiled out
  (b==1 static fast path skips patch norms + scale entirely). The
  difference isolates the total cost of the B-cos scale machinery
  (fwd patch norms + scale residual traffic + bwd scale multiply).
- dual-stream: two independent 64-image explains per iteration — tests
  whether giving the static scheduler two dependency chains buys DMA/MXU
  overlap that a single 128 chain can't.

Run on TPU: python scripts/perf_probe8.py
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


def build(b=2):
    from __graft_entry__ import _flagship
    from bcosification_tpu.bcosify.engine import build_bcosified_resnet

    model_config = {
        "name": "resnet50",
        "bcosify_args": {
            "fix_b": True, "use_bias": False, "norm_layer": "BnUncV2",
            "gap": True, "act_layer": True,
        },
        "bcos_args": {"b": b},
    }
    return build_bcosified_resnet(model_config, None, input_size=224,
                                  num_classes=1000, inplanes=64)


def make_explain(net, split=1):
    from bcosification_tpu.explain.core import dynamic_linear_weights

    @partial(jax.jit, static_argnums=(2,))
    def f(variables, x, n):
        def body(i, carry):
            acc, xx = carry

            def g(inp):
                return net.apply(variables, inp, train=False, explain=True)

            parts = jnp.split(xx, split, axis=0) if split > 1 else [xx]
            for p in parts:
                logits, sel, w = dynamic_linear_weights(g, p)
                acc = acc + ((p * w).sum(-1).mean() + logits.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))[0]

    return f


def slope(jitted, args, n_small=2, n_big=12):
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
    x = jnp.asarray(rng.random((B, 224, 224, 6), dtype=np.float32), jnp.bfloat16)

    net2, var2 = build(b=2)
    t = slope(make_explain(net2), (var2, x))
    print(f"b=2 default   : {t*1e3:6.2f} ms  {B/t:7.0f} img/s")

    net1, var1 = build(b=1)
    t1 = slope(make_explain(net1), (var1, x))
    print(f"b=1 (no scale): {t1*1e3:6.2f} ms  {B/t1:7.0f} img/s")

    t2 = slope(make_explain(net2, split=2), (var2, x))
    print(f"b=2 dual-64   : {t2*1e3:6.2f} ms  {B/t2:7.0f} img/s")

    t4 = slope(make_explain(net2, split=4), (var2, x))
    print(f"b=2 quad-32   : {t4*1e3:6.2f} ms  {B/t4:7.0f} img/s")


if __name__ == "__main__":
    main()

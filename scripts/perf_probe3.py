"""Perf probe 3: activation-only rematerialisation policy for fwd+explain.

Variants (batch 128 bf16, set BCOS_EXPLAIN_CONV=0/1 before running to toggle
the whole-layer custom-VJP conv):
  A no-policy          — plain vjp over the forward
  B save-acts          — jax.checkpoint(policy=save_only_these_names("bcos_act"))
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, variables, x, n_small=2, n_big=12):
    float(fn(variables, x, 2))
    float(fn(variables, x, n_big))
    t0 = time.perf_counter()
    float(fn(variables, x, n_small))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(variables, x, n_big))
    t_big = time.perf_counter() - t0
    return x.shape[0] / ((t_big - t_small) / (n_big - n_small))


def make(net, wrap=None):
    from bcosification_tpu.explain.core import dynamic_linear_weights

    @partial(jax.jit, static_argnums=(2,))
    def fn(variables, x, n):
        def body(i, carry):
            acc, xx = carry

            def f(inp):
                return net.apply(variables, inp, train=False, explain=True)

            if wrap is not None:
                f = wrap(f)
            logits, sel, w = dynamic_linear_weights(f, xx)
            cmap = (xx * w).sum(-1)
            acc = acc + (cmap.mean() + logits.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    return fn


def main():
    from __graft_entry__ import _flagship

    print("BCOS_EXPLAIN_CONV =", os.getenv("BCOS_EXPLAIN_CONV", "1"))
    net, variables = _flagship(input_size=224, arch="resnet50")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 224, 224, 6), dtype=np.float32)).astype(
        jnp.bfloat16
    )
    save_acts = lambda f: jax.checkpoint(
        f, policy=jax.checkpoint_policies.save_only_these_names("bcos_act")
    )
    for name, wrap in [("A no-policy", None), ("B save-acts", save_acts)]:
        try:
            ips = timed(make(net, wrap), variables, x)
            print(f"{name}: {ips:.0f} img/s")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

"""Perf probe 4: per-segment fwd+explain cost — is the stem's transposed conv
(cotangent 64ch @112^2 -> input 6ch @224^2, ~6/128 MXU lane utilisation) the
backward bottleneck?

Times (batch 128 bf16):
  stem-only explain       — conv1(7x7 s2 6->64) + BNUnc + ReLU + avgpool
  trunk-only explain      — layers1-4 + fc on a [128,56,56,64] input
  full model explain      — reference point
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed(fn, variables, x, n_small=2, n_big=12):
    float(fn(variables, x, 2))
    float(fn(variables, x, n_big))
    t0 = time.perf_counter()
    float(fn(variables, x, n_small))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(variables, x, n_big))
    t_big = time.perf_counter() - t0
    per_iter = (t_big - t_small) / (n_big - n_small)
    return per_iter * 1e3  # ms/iter


def make(apply_fn):
    @partial(jax.jit, static_argnums=(2,))
    def fn(variables, x, n):
        def body(i, carry):
            acc, xx = carry

            def f(inp):
                return apply_fn(variables, inp)

            out, vjp = jax.vjp(f, xx)
            (g,) = vjp(jnp.ones_like(out))
            acc = acc + (g.mean() + out.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    return fn


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False, explain=True):
        from bcosification_tpu.modules import BcosifyConv2d, ReLU, norms
        from bcosification_tpu.ops import pooling

        f = dict(train=train, explain=explain)
        x = BcosifyConv2d(64, kernel_size=7, stride=2, padding=3, name="conv1")(x, **f)
        x = norms.NoBias(norms.BatchNormUncentered2d)(features=64, name="bn1")(x, **f)
        x = ReLU(name="act")(x, **f)
        return pooling.avg_pool2d(x, 3, 2, 1)


def main():
    from __graft_entry__ import _flagship

    rng = np.random.default_rng(0)

    stem = Stem()
    x6 = jnp.asarray(rng.random((128, 224, 224, 6), dtype=np.float32)).astype(
        jnp.bfloat16
    )
    sv = stem.init(jax.random.PRNGKey(0), jnp.ones((1, 224, 224, 6), jnp.bfloat16))
    ms = timed(make(lambda v, x: stem.apply(v, x, explain=True)), sv, x6)
    print(f"stem-only fwd+vjp: {ms:.2f} ms/iter")

    net, variables = _flagship(input_size=224, arch="resnet50")
    from bcosification_tpu.explain.core import dynamic_linear_weights

    def full(v, x):
        return net.apply(v, x, train=False, explain=True)

    @partial(jax.jit, static_argnums=(2,))
    def full_fn(v, x, n):
        def body(i, carry):
            acc, xx = carry
            logits, sel, w = dynamic_linear_weights(lambda t: full(v, t), xx)
            acc = acc + (w.mean() + logits.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    ms = timed(full_fn, variables, x6)
    print(f"full model fwd+explain: {ms:.2f} ms/iter ({128/ms*1e3:.0f} img/s)")


if __name__ == "__main__":
    main()

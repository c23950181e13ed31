"""Probe 9 (round 2): platform Pallas-vs-XLA streaming bandwidth ceiling.

Measures a trivial 3-read/1-write elementwise kernel both ways. Result on
the axon v5e toolchain: XLA 641 GB/s, Pallas best 425 GB/s -- Pallas DMA is
bandwidth-capped at ~65% of XLA, which is why every fused-kernel attempt in
rounds 1-2 lost end-to-end. Run on TPU: python scripts/perf_probe9.py
"""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, C = 401408, 256
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32)).astype(jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32)).astype(jnp.bfloat16)
c = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32)).astype(jnp.bfloat16)

def make(TM, nin):
    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        acc = ins[0][...]
        for r in ins[1:]:
            acc = acc + r[...]
        out[...] = acc
    def fn(*arrs):
        return pl.pallas_call(
            kernel, grid=(M // TM,),
            in_specs=[pl.BlockSpec((TM, C), lambda i: (i, 0)) for _ in range(nin)],
            out_specs=pl.BlockSpec((TM, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(*arrs)
    return fn

def xla_fn(a, b, c):
    return a + b + c

def bench(fn, name, args, nbytes):
    @functools.partial(jax.jit, static_argnums=(0,))
    def loop(nst, *ar):
        def body(i, carry):
            acc, aa = carry
            out = fn(aa, *ar[1:])
            acc = acc + out.astype(jnp.float32).mean()
            aa = aa + (1e-12 * acc).astype(aa.dtype)
            return acc, aa
        return jax.lax.fori_loop(0, nst, body, (jnp.float32(0), ar[0]))[0]
    float(loop(2, *args)); float(loop(42, *args))
    best = None
    for _ in range(3):
        t0=time.perf_counter(); float(loop(2, *args)); ts=time.perf_counter()-t0
        t0=time.perf_counter(); float(loop(42, *args)); tb=time.perf_counter()-t0
        per=(tb-ts)/40; best = per if best is None else min(best, per)
    print(f"{name}: {best*1e3:.3f} ms = {nbytes/best/1e9:.0f} GB/s")

NB = M*C*2*4  # 3 reads + 1 write
bench(xla_fn, "XLA a+b+c        ", (a,b,c), NB)
bench(make(512, 3),  "Pallas TM512     ", (a,b,c), NB)
bench(make(1024, 3), "Pallas TM1024    ", (a,b,c), NB)
bench(make(2048, 3), "Pallas TM2048    ", (a,b,c), NB)

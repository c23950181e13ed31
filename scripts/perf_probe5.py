"""Probe 5 (round 2): where do the 31ms of fwd+explain actually go?

1. fori_loop slope timing of: fwd-only, fwd+explain, explain with
   BCOS_EXPLAIN_CONV variants.
2. Optimized-HLO census: per-opcode counts and output bytes, convolutions
   split into forward vs input-dilated (transpose) vs others, fusion output
   bytes, copies. This replaces trust in cost_analysis() bytes (VERDICT r1:
   those provably overstate traffic).

Run on TPU: python scripts/perf_probe5.py [fwd|explain|census|all]
"""
import os
import re
import sys
import time
from collections import defaultdict
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.getenv("BENCH_BATCH", "128"))


def timed(fn, variables, x, n_small=2, n_big=12):
    float(fn(variables, x, 2))
    float(fn(variables, x, n_big))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(variables, x, n_small))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(variables, x, n_big))
        t_big = time.perf_counter() - t0
        per = (t_big - t_small) / (n_big - n_small)
        best = per if best is None else min(best, per)
    return best


def build():
    from __graft_entry__ import _flagship

    return _flagship(input_size=224, arch="resnet50")


def make_fwd(net):
    @partial(jax.jit, static_argnums=(2,))
    def fwd_only(variables, x, n):
        def body(i, carry):
            acc, xx = carry
            logits = net.apply(variables, xx, train=False, explain=False)
            acc = acc + logits.mean().astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    return fwd_only


def make_explain(net):
    from bcosification_tpu.explain.core import dynamic_linear_weights

    @partial(jax.jit, static_argnums=(2,))
    def bench_n(variables, x, n):
        def body(i, carry):
            acc, xx = carry

            def f(inp):
                return net.apply(variables, inp, train=False, explain=True)

            logits, sel, w = dynamic_linear_weights(f, xx)
            cmap = (xx * w).sum(-1)
            acc = acc + (cmap.mean() + logits.mean()).astype(jnp.float32)
            xx = xx + (1e-12 * acc).astype(xx.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    return bench_n


_SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|s8|u8|pred)\[([\d,]*)\]")
_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "s8": 1, "u8": 1, "pred": 1}


def _out_bytes(line: str) -> int:
    """bytes of the op's output type annotation: 'name = TYPE opcode(...)'."""
    total = 0
    rhs = line.split(" = ", 1)[-1]
    type_str = rhs.split(" ")[0] if rhs else ""
    for m in _SHAPE_RE.finditer(type_str):
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        total += n * _BYTES[m.group(1)]
    return total


def census(compiled, label):
    try:
        hlo = compiled.as_text()
    except Exception as e:
        print(f"[{label}] no HLO text: {e}")
        return
    per_op_bytes = defaultdict(int)
    per_op_count = defaultdict(int)
    conv_lines = []
    for line in hlo.splitlines():
        s = line.strip()
        if " = " not in s or s.startswith("ROOT tuple"):
            continue
        m = re.search(r"= \S+ ([a-z][a-z0-9\-]*)\(", s)
        if not m:
            continue
        op = m.group(1)
        b = _out_bytes(s)
        per_op_count[op] += 1
        per_op_bytes[op] += b
        if op == "convolution":
            conv_lines.append(s)
    print(f"\n[{label}] opcode census (output bytes, MB):")
    for op, b in sorted(per_op_bytes.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {op:24s} n={per_op_count[op]:4d}  {b/1e6:9.1f} MB")
    # classify convolutions
    fwd_b = dil_b = 0
    fwd_n = dil_n = 0
    for s in conv_lines:
        b = _out_bytes(s)
        if "lhs_dilate" in s or "rhs_reversal" in s.split("window=")[-1][:200]:
            dil_b += b
            dil_n += 1
        else:
            fwd_b += b
            fwd_n += 1
    print(f"  convolutions: forward n={fwd_n} {fwd_b/1e6:.1f} MB | "
          f"transpose/dilated n={dil_n} {dil_b/1e6:.1f} MB")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dtype = jnp.bfloat16
    net, variables = build()
    x = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 224, 224, 6), dtype=np.float32)
    ).astype(dtype)

    if which in ("fwd", "all"):
        f = make_fwd(net)
        per = timed(f, variables, x)
        print(f"fwd-only: {per*1e3:.2f} ms/iter = {BATCH/per:.0f} img/s")
    if which in ("explain", "all"):
        f = make_explain(net)
        per = timed(f, variables, x)
        print(f"fwd+explain: {per*1e3:.2f} ms/iter = {BATCH/per:.0f} img/s")
    if which in ("census", "all"):
        f = make_explain(net)
        compiled = f.lower(variables, x, 1).compile()
        census(compiled, "fwd+explain n=1")
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            print(f"  cost_analysis: {ca.get('flops', 0)/1e9:.1f} GFLOP, "
                  f"{ca.get('bytes accessed', 0)/1e9:.2f} GB accessed")
        except Exception as e:
            print("  cost_analysis failed:", e)
        g = make_fwd(net)
        compiled = g.lower(variables, x, 1).compile()
        census(compiled, "fwd-only n=1")


if __name__ == "__main__":
    main()

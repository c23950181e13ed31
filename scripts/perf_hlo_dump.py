"""Dump the optimized HLO of the fwd+explain step and summarize where the
bytes live: per-op-kind totals of operand+output buffer sizes (a proxy for
HBM traffic), largest individual ops, and any f32 activation-sized tensors.
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _flagship
    from bcosification_tpu.explain.core import dynamic_linear_weights

    net, variables = _flagship(input_size=224, arch="resnet50")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 224, 224, 6), dtype=np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def one_step(variables, x):
        def f(inp):
            return net.apply(variables, inp, train=False, explain=True)

        logits, sel, w = dynamic_linear_weights(f, x)
        return (x * w).sum(-1).mean() + logits.mean()

    txt = one_step.lower(variables, x).compile().as_text()
    out = "/tmp/rn50_explain_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt)/1e6:.1f} MB")

    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8}
    shape_re = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|f64|s64)\[([0-9,]*)\]")

    def shape_bytes(s):
        total = 0
        for dt, dims in shape_re.findall(s):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dt_bytes[dt]
        return total

    # roots of the entry computation: lines "  %name = <shape> <op>(...)"
    op_re = re.compile(r"^\s+\%?[\w.-]+ = ([\w\[\],0-9 ]+?) (\w+)\(")
    by_kind = defaultdict(lambda: [0, 0])
    biggest = []
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        m = op_re.match(line)
        if not m:
            continue
        outshape, op = m.groups()
        b_out = shape_bytes(outshape)
        by_kind[op][0] += b_out
        by_kind[op][1] += 1
        if b_out > 20e6:
            biggest.append((b_out, op, line.strip()[:160]))

    print("\n-- entry-computation output bytes by op kind --")
    for op, (b, c) in sorted(by_kind.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"  {op:22s} {b/1e9:7.2f} GB out  ({c} ops)")
    print("\n-- largest single outputs (>20MB) --")
    for b, op, line in sorted(biggest, reverse=True)[:25]:
        print(f"  {b/1e6:7.0f} MB {line}")

    # count fusions whose output is f32 and activation-sized (poor dtype fusion)
    f32_big = [l for l in txt.splitlines() if re.search(r"= f32\[128,\d+,\d+", l)]
    print(f"\n{len(f32_big)} ops with big f32[128,...] outputs; first 10:")
    for l in f32_big[:10]:
        print("  " + l.strip()[:160])


if __name__ == "__main__":
    main()

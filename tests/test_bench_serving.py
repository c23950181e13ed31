"""scripts/bench_serving.py logic on CPU (tiny shapes, no TPU):

- blend_rate is the weighted harmonic mean with the right endpoints and
  monotone between them;
- the lax.cond-dispatched mixed loop computes exactly what a Python loop
  over the same two branch programs computes (i.e. the serving blend is
  measured on the real programs, not a stand-in).
"""
import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_bench_serving():
    spec = importlib.util.spec_from_file_location(
        "bench_serving_under_test", REPO / "scripts" / "bench_serving.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_blend_rate_endpoints_and_monotone():
    bs = _load_bench_serving()
    r_fwd, r_explain = 12000.0, 4000.0
    assert bs.blend_rate(0.0, r_fwd, r_explain) == r_fwd
    assert bs.blend_rate(1.0, r_fwd, r_explain) == pytest.approx(r_explain)
    # harmonic mean: p=0.5 is 2/(1/a+1/b), not the arithmetic mean
    assert bs.blend_rate(0.5, r_fwd, r_explain) == pytest.approx(6000.0)
    ps = [0.0, 0.01, 0.1, 0.5, 1.0]
    rates = [bs.blend_rate(p, r_fwd, r_explain) for p in ps]
    assert rates == sorted(rates, reverse=True)


def test_mixed_loop_matches_python_reference(monkeypatch):
    # autodiff branch so the test can reconstruct it verbatim
    monkeypatch.setenv("BCOS_FAST_EXPLAIN", "0")
    bs = _load_bench_serving()
    from __graft_entry__ import _flagship
    from bcosification_tpu.explain.core import dynamic_linear_weights

    net, variables = _flagship(
        input_size=32, inplanes=8, num_classes=10,
        layers=("bottleneck", (1, 1, 1, 1)),
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 6), dtype=np.float32)
    )
    every, n = 3, 5  # explain at i=0,3; fwd at i=1,2,4
    mixed = bs.make_mixed_fn(net, every)
    got = float(mixed(variables, x, n))

    def explain_branch(xx):
        logits, _, w = dynamic_linear_weights(
            lambda inp: net.apply(variables, inp, train=False, explain=True), xx
        )
        return ((xx * w).sum(-1).mean() + logits.mean()).astype(jnp.float32)

    def fwd_branch(xx):
        return net.apply(variables, xx, train=False).mean().astype(jnp.float32)

    acc, xx = jnp.float32(0), x
    for i in range(n):
        acc = acc + (explain_branch(xx) if i % every == 0 else fwd_branch(xx))
        xx = xx + (1e-12 * acc).astype(xx.dtype)

    assert np.isfinite(got)
    np.testing.assert_allclose(got, float(acc), rtol=1e-5)

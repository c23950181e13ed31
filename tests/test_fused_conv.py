"""Fused conv+BN+act path (BCOS_FUSED=1): value/gradient parity with the
default module-composed graph, and the BN return_affine fusion hook."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.explain.core import dynamic_linear_weights


@pytest.fixture
def rn18(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship

    net, variables = _flagship(input_size=32, arch="resnet18")
    return net, variables


def _with_fused(flag, fn):
    old = os.environ.get("BCOS_FUSED")
    os.environ["BCOS_FUSED"] = flag
    try:
        return fn()
    finally:
        if old is None:
            os.environ.pop("BCOS_FUSED", None)
        else:
            os.environ["BCOS_FUSED"] = old


def test_fused_path_matches_default(rn18, rng):
    net, variables = rn18
    x = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))

    base = _with_fused("0", lambda: net.apply(variables, x, train=False, explain=True))
    fused = _with_fused("1", lambda: net.apply(variables, x, train=False, explain=True))
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), rtol=1e-5, atol=1e-6
    )

    # design invariant: values identical between explain modes on the fused path
    fused_ne = _with_fused(
        "1", lambda: net.apply(variables, x, train=False, explain=False)
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(fused_ne), atol=0)


def test_fused_explain_gradients_match(rn18, rng):
    net, variables = rn18
    x = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))

    def w_of(flag):
        def go():
            f = lambda t: net.apply(variables, t, train=False, explain=True)
            _, _, w = dynamic_linear_weights(f, x)
            return np.asarray(w)

        return _with_fused(flag, go)

    w0, w1 = w_of("0"), w_of("1")
    np.testing.assert_allclose(w1, w0, rtol=1e-4, atol=1e-6)


def test_bn_return_affine_equivalence(rng):
    from bcosification_tpu.modules import norms

    bn = norms.NoBias(norms.BatchNormUncentered2d)(features=8)
    x = jnp.asarray(rng.random((2, 4, 4, 8)).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)
    # perturb running_var/weight so the affine is non-trivial
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.3 if v.ndim == 1 else v, variables
    )
    y = bn.apply(variables, x, train=False)
    mult, add = bn.apply(variables, None, train=False, return_affine=True)
    y2 = x * mult.reshape(1, 1, 1, -1)
    if add is not None:
        y2 = y2 + add.reshape(1, 1, 1, -1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)
    assert add is None  # NoBias nulls the bias


def test_fused_op_direct_parity(rng):
    from bcosification_tpu.ops.pallas.bcos_conv1x1 import bcos_conv1x1_bn_act
    from bcosification_tpu.ops import bcos as ops

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 16)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    mult = jnp.asarray((rng.random(8) + 0.5).astype(np.float32))
    add = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    got = bcos_conv1x1_bn_act(x, w2, None, mult, add, relu=True, explain=True)
    want = ops.bcos_conv2d(
        x, w2.reshape(1, 1, 16, 8), b=2.0, normalize_weights=False, explain=True
    )
    want = jnp.maximum(want * mult.reshape(1, 1, 1, -1) + add.reshape(1, 1, 1, -1), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

"""Space-to-depth stem conv: exactness of the stride-2 reformulation.

ops.bcos._s2d_conv_s2 rewrites k x k / stride-2 convs (the RN18/50/DenseNet
stem instance of the reference hot loop, `/root/reference/bcos/modules/
bcosconv2d.py:153-231`) as space-to-depth + one dense stride-1 conv, so the
autodiff transpose is dense instead of 75%-zero input-dilated. Must be exact
up to fp reassociation for every gated shape, forward and backward.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from bcosification_tpu.ops import bcos as ops


@pytest.mark.parametrize(
    "k,h,cin,cout",
    [(7, 64, 6, 16), (3, 32, 8, 16), (5, 24, 4, 8)],
)
def test_s2d_conv_matches_dilated(rng, k, h, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32))
    pad = (k - 1) // 2
    ref = lax.conv_general_dilated(
        x, w, (2, 2), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    got = ops._s2d_conv_s2(x, w, (pad, pad))
    assert got.shape == ref.shape == (2, h // 2, h // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_s2d_gating(rng, monkeypatch):
    monkeypatch.setenv("BCOS_S2D_STEM", "1")
    x = jnp.zeros((1, 64, 64, 6))
    w7 = jnp.zeros((7, 7, 6, 8))
    assert ops._s2d_applicable(x, w7, 2, 3, 1, 1)
    assert not ops._s2d_applicable(x, w7, 1, 3, 1, 1)  # stride 1
    assert not ops._s2d_applicable(x, w7, 2, 2, 1, 1)  # non-centred padding
    assert not ops._s2d_applicable(x, w7, 2, 3, 2, 1)  # dilation
    assert not ops._s2d_applicable(x, w7, 2, 3, 1, 2)  # groups
    assert not ops._s2d_applicable(jnp.zeros((1, 63, 64, 6)), w7, 2, 3, 1, 1)  # odd H
    assert not ops._s2d_applicable(
        jnp.zeros((1, 64, 64, 256)), jnp.zeros((3, 3, 256, 256)), 2, 1, 1, 1
    )  # deep layers stay on the native path
    assert not ops._s2d_applicable(x, jnp.zeros((1, 1, 6, 8)), 2, 0, 1, 1)  # 1x1
    monkeypatch.setenv("BCOS_S2D_STEM", "0")
    assert not ops._s2d_applicable(x, w7, 2, 3, 1, 1)  # default-off gate


def test_s2d_grad_matches(rng, monkeypatch):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, 7, 6, 8)).astype(np.float32))

    def loss(x, w, s2d):
        os.environ["BCOS_S2D_STEM"] = "1" if s2d else "0"
        return (ops._conv(x, w, 2, 3, 1, 1) ** 2).sum()

    try:
        gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, w, True)
        gx0, gw0 = jax.grad(loss, argnums=(0, 1))(x, w, False)
    finally:
        os.environ.pop("BCOS_S2D_STEM", None)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), rtol=1e-3, atol=1e-3)


def test_s2d_inside_bcos_conv2d(rng):
    """Full B-cos stem op (conv + patch norms + dynamic scale) agrees across
    the two conv formulations, values and explain mode."""
    x = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, 7, 6, 8)).astype(np.float32))

    def run(s2d, explain):
        os.environ["BCOS_S2D_STEM"] = "1" if s2d else "0"
        return ops.bcos_conv2d(
            x, w, b=2.0, stride=2, padding=3, normalize_weights=False,
            explain=explain,
        )

    try:
        for explain in (False, True):
            a = np.asarray(run(True, explain))
            b = np.asarray(run(False, explain))
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    finally:
        os.environ.pop("BCOS_S2D_STEM", None)

"""Unit tests for the core B-cos ops.

Two oracle layers:
1. internal: fast reduce_window patch norms vs the ones-kernel reference impl
   (the analogue of the reference's `_calc_patch_norms_slow`).
2. external: numerical parity (values AND input-gradients, in both normal and
   explanation mode) against the PyTorch reference modules loaded from
   /root/reference (skipped when unavailable).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.ops import bcos as ops

from reference_loader import load_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.parametrize(
    "ks,stride,padding,dilation,groups",
    [
        (3, 1, 1, 1, 1),
        (3, 2, 1, 1, 1),
        (7, 2, 3, 1, 1),
        (1, 1, 0, 1, 1),
        (3, 1, 2, 2, 1),  # dilation
        (3, 1, 1, 1, 4),  # groups
        (5, 3, 2, 2, 2),  # everything at once
    ],
)
def test_patch_norms_fast_vs_reference(rng, ks, stride, padding, dilation, groups):
    x = jnp.asarray(rng.standard_normal((2, 13, 17, 8), dtype=np.float32))
    out_channels = 8
    w_shape = (ks, ks, 8 // groups, out_channels)
    fast = ops.patch_norms(
        x,
        (ks, ks),
        stride=stride,
        padding=padding,
        dilation=dilation,
        groups=groups,
        out_channels=out_channels,
    )
    slow = ops.patch_norms_reference(
        x, w_shape, stride=stride, padding=padding, dilation=dilation, groups=groups
    )
    if groups == 1:
        slow = slow[..., :1]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("b", [1, 2, 2.5])
@pytest.mark.parametrize("max_out", [1, 2])
def test_bcos_conv2d_fast_vs_naive(rng, b, max_out):
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 6), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 8 * max_out), dtype=np.float32))
    kw = dict(b=b, stride=1, padding=1, max_out=max_out)
    y_fast = ops.bcos_conv2d(x, w, **kw)
    y_naive = ops.bcos_conv2d_reference(x, w, **kw)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_naive), rtol=1e-4, atol=1e-5)


def _to_torch_conv_weight(w):
    """HWIO -> OIHW"""
    import torch

    return torch.from_numpy(np.asarray(w).transpose(3, 2, 0, 1).copy())


def _torch_grad(mod, xt, explain):
    import torch

    if explain and hasattr(mod, "set_explanation_mode"):
        mod.set_explanation_mode(True)
    xt = xt.clone().requires_grad_(True)
    out = mod(xt)
    out.sum().backward()
    if explain and hasattr(mod, "set_explanation_mode"):
        mod.set_explanation_mode(False)
    return out.detach().numpy(), xt.grad.detach().numpy()


@needs_reference
@pytest.mark.parametrize("b", [1, 2, 2.5])
@pytest.mark.parametrize("explain", [False, True])
@pytest.mark.parametrize(
    "ks,stride,padding,groups,max_out",
    [(3, 1, 1, 1, 1), (3, 2, 1, 1, 1), (1, 1, 0, 1, 1), (3, 1, 1, 2, 1), (3, 1, 1, 1, 2)],
)
def test_bcos_conv2d_vs_torch_reference(rng, b, explain, ks, stride, padding, groups, max_out):
    import torch

    ref = load_reference("bcos.modules.bcosconv2d")
    tmod = ref.BcosConv2d(
        8, 4, kernel_size=ks, stride=stride, padding=padding, groups=groups, b=b, max_out=max_out
    )
    w = rng.standard_normal((ks, ks, 8 // groups, 4 * max_out)).astype(np.float32)
    with torch.no_grad():
        tmod.linear.weight.copy_(_to_torch_conv_weight(w))

    x = rng.standard_normal((2, 8, 9, 9)).astype(np.float32)  # NCHW for torch
    t_out, t_grad = _torch_grad(tmod, torch.from_numpy(x), explain)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    def f(xx):
        return ops.bcos_conv2d(
            xx,
            jnp.asarray(w),
            b=b,
            stride=stride,
            padding=padding,
            groups=groups,
            max_out=max_out,
            explain=explain,
        ).sum()

    j_out = ops.bcos_conv2d(
        x_nhwc, jnp.asarray(w), b=b, stride=stride, padding=padding, groups=groups,
        max_out=max_out, explain=explain,
    )
    j_grad = jax.grad(f)(x_nhwc)

    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_grad).transpose(0, 3, 1, 2), t_grad, rtol=1e-4, atol=1e-5
    )


@needs_reference
@pytest.mark.parametrize("b", [1, 2, 2.5])
@pytest.mark.parametrize("explain", [False, True])
@pytest.mark.parametrize("max_out", [1, 2])
def test_bcos_linear_vs_torch_reference(rng, b, explain, max_out):
    import torch

    ref = load_reference("bcos.modules.bcoslinear")
    tmod = ref.BcosLinear(16, 8, b=b, max_out=max_out)
    w = rng.standard_normal((16, 8 * max_out)).astype(np.float32)
    with torch.no_grad():
        tmod.linear.weight.copy_(torch.from_numpy(w.T.copy()))

    x = rng.standard_normal((4, 16)).astype(np.float32)
    t_out, t_grad = _torch_grad(tmod, torch.from_numpy(x), explain)

    def f(xx):
        return ops.bcos_linear(
            xx, jnp.asarray(w), b=b, max_out=max_out, explain=explain
        ).sum()

    j_out = ops.bcos_linear(jnp.asarray(x), jnp.asarray(w), b=b, max_out=max_out, explain=explain)
    j_grad = jax.grad(f)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_grad), t_grad, rtol=1e-4, atol=1e-5)


@needs_reference
@pytest.mark.parametrize("explain", [False, True])
def test_bcosify_conv2d_with_bias_vs_torch(rng, explain):
    """BcosifyConv2d: raw (un-normalised) weights + bias inside the linear."""
    import torch

    ref = load_reference("bcos.modules.bcosifyconv2d")
    cfg = {"bcosify_args": {}, "bcos_args": {"b": 2}, "weights": True}
    tconv = torch.nn.Conv2d(6, 4, 3, padding=1, bias=True)
    tmod = ref.BcosifyConv2d.from_standard_module(tconv, cfg)

    w = np.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))
    bias = np.asarray(tconv.bias.detach().numpy())
    x = rng.standard_normal((2, 6, 9, 9)).astype(np.float32)
    t_out, t_grad = _torch_grad(tmod, torch.from_numpy(x), explain)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    def f(xx):
        return ops.bcos_conv2d(
            xx, jnp.asarray(w), b=2, padding=1, normalize_weights=False,
            bias=jnp.asarray(bias), explain=explain,
        ).sum()

    j_out = ops.bcos_conv2d(
        x_nhwc, jnp.asarray(w), b=2, padding=1, normalize_weights=False,
        bias=jnp.asarray(bias), explain=explain,
    )
    j_grad = jax.grad(f)(x_nhwc)
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_grad).transpose(0, 3, 1, 2), t_grad, rtol=1e-4, atol=1e-5
    )


def test_b1_is_plain_normed_conv(rng):
    """b=1 must reduce to a plain conv with unit-norm weights (identity-at-init
    property that the bcosification conversion relies on)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4), dtype=np.float32))
    y = ops.bcos_conv2d(x, w, b=1, padding=1)
    y2 = ops.normed_conv2d(x, w, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6, atol=1e-6)
    # and with normalize_weights=False it's numerically a *plain* conv
    y3 = ops.bcos_conv2d(x, w, b=1, padding=1, normalize_weights=False)
    y4 = ops.normed_conv2d(x, w, padding=1, use_weight_norm=False)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y4), rtol=1e-6, atol=1e-6)


def test_explain_mode_is_linear(rng):
    """In explanation mode the layer must be exactly linear in x:
    f(x) == <x, grad f(x)> for bias-free B-cos layers (completeness)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4), dtype=np.float32))

    def f(xx):
        return ops.bcos_conv2d(xx, w, b=2, padding=1, explain=True).sum()

    val, grad = jax.value_and_grad(f)(x)
    np.testing.assert_allclose(float(val), float((x * grad).sum()), rtol=1e-4)

    # scaling the input by t>0 scales the output by exactly t (dynamic-linear)
    # note: in explain mode gradients treat scale as constant, but the *value*
    # is the same as normal mode; linearity of the VJP is the key property.
    g2 = jax.grad(f)(2.0 * x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g2), rtol=1e-3, atol=1e-5)

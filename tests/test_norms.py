"""Norm zoo tests: torch-reference parity (values + input gradients, normal and
explanation mode) and running-stat behaviour."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.modules import norms as N

from reference_loader import load_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def _from_nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _torch_out_grad(tmod, x, explain, training):
    import torch

    tmod.train(training)
    if explain and hasattr(tmod, "set_explanation_mode"):
        tmod.set_explanation_mode(True)
    xt = torch.from_numpy(x).clone().requires_grad_(True)
    out = tmod(xt)
    out.sum().backward()
    if explain and hasattr(tmod, "set_explanation_mode"):
        tmod.set_explanation_mode(False)
    return out.detach().numpy(), xt.grad.detach().numpy()


def _jax_out_grad(mod, variables, x_nhwc, explain, train):
    def f(xx):
        out = mod.apply(
            variables, xx, train=train, explain=explain, mutable=["batch_stats"]
        )[0]
        return out.sum(), out

    (loss, out), grad = jax.value_and_grad(f, has_aux=True)(x_nhwc)
    return np.asarray(out), np.asarray(grad)


@needs_reference
@pytest.mark.parametrize("explain", [False, True])
@pytest.mark.parametrize("training", [False, True])
def test_bn_uncentered_vs_torch(rng, explain, training):
    import torch

    ref = load_reference("bcos.modules.norms.uncentered_norms.batchnorm_uncentered")
    tmod = ref.BatchNormUncentered2d(8, bias=True)
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(rng.random(8).astype(np.float32) + 0.5))
        tmod.bias.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))
        tmod.running_var.copy_(torch.from_numpy(rng.random(8).astype(np.float32) + 0.5))

    x = rng.standard_normal((4, 8, 5, 5)).astype(np.float32)
    t_out, t_grad = _torch_out_grad(tmod, x, explain, training)

    mod = N.BatchNormUncentered2d(features=8)
    variables = {
        "params": {
            "weight": jnp.asarray(tmod.weight.detach().numpy()),
            "bias": jnp.asarray(tmod.bias.detach().numpy()),
        },
        "batch_stats": {
            # use pre-forward stats (torch updated its copy in-place during fwd)
            "running_var": jnp.asarray(
                tmod.running_var.detach().numpy()
                if not training
                else np.asarray(rng.random(8), np.float32)  # placeholder, unused in train fwd
            ),
            "num_batches_tracked": jnp.zeros((), jnp.int32),
        },
    }
    if training:
        # in train mode the normalisation uses batch stats, so running_var is
        # irrelevant for the output — just needs the right shape
        variables["batch_stats"]["running_var"] = jnp.ones((8,), jnp.float32)
    j_out, j_grad = _jax_out_grad(mod, variables, _nhwc(x), explain, training)
    np.testing.assert_allclose(_from_nhwc(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_from_nhwc(j_grad), t_grad, rtol=1e-4, atol=1e-5)


@needs_reference
def test_bn_uncentered_running_stats_update(rng):
    import torch

    ref = load_reference("bcos.modules.norms.uncentered_norms.batchnorm_uncentered")
    tmod = ref.BatchNormUncentered2d(8, bias=True)
    x = rng.standard_normal((4, 8, 5, 5)).astype(np.float32)
    tmod.train(True)
    tmod(torch.from_numpy(x))

    mod = N.BatchNormUncentered2d(features=8)
    variables = mod.init(jax.random.PRNGKey(0), _nhwc(x), train=False)
    _, updated = mod.apply(variables, _nhwc(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["running_var"]),
        tmod.running_var.detach().numpy(),
        rtol=1e-5,
    )


@needs_reference
@pytest.mark.parametrize("explain", [False, True])
@pytest.mark.parametrize(
    "ref_name,my_factory,groups",
    [
        ("GroupNormUncentered2d", lambda: N.GroupNormUncentered2d(features=8, num_groups=4), 4),
        ("GNInstanceNormUncentered2d", lambda: N.GNInstanceNormUncentered2d(features=8), 8),
        ("GNLayerNormUncentered2d", lambda: N.GNLayerNormUncentered2d(features=8), 1),
    ],
)
def test_gn_uncentered_vs_torch(rng, explain, ref_name, my_factory, groups):
    import torch

    ref = load_reference("bcos.modules.norms.uncentered_norms.groupnorm_uncentered")
    if ref_name == "GroupNormUncentered2d":
        tmod = getattr(ref, ref_name)(4, 8)
    else:
        tmod = getattr(ref, ref_name)(8)
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(rng.random(8).astype(np.float32) + 0.5))
        tmod.bias.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))
    x = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
    t_out, t_grad = _torch_out_grad(tmod, x, explain, False)

    mod = my_factory()
    variables = {
        "params": {
            "weight": jnp.asarray(tmod.weight.detach().numpy()),
            "bias": jnp.asarray(tmod.bias.detach().numpy()),
        }
    }
    j_out, j_grad = _jax_out_grad(mod, variables, _nhwc(x), explain, False)
    np.testing.assert_allclose(_from_nhwc(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_from_nhwc(j_grad), t_grad, rtol=1e-4, atol=1e-5)


@needs_reference
@pytest.mark.parametrize("explain", [False, True])
def test_detachable_layernorm_vs_torch(rng, explain):
    import torch

    ref = load_reference("bcos.modules.norms.centered_norms")
    tmod = ref.DetachableLayerNorm(16)
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(rng.random(16).astype(np.float32) + 0.5))
        tmod.bias.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
    x = rng.standard_normal((4, 7, 16)).astype(np.float32)
    t_out, t_grad = _torch_out_grad(tmod, x, explain, False)

    mod = N.DetachableLayerNorm(features=16)
    variables = {
        "params": {
            "weight": jnp.asarray(tmod.weight.detach().numpy()),
            "bias": jnp.asarray(tmod.bias.detach().numpy()),
        }
    }

    def f(xx):
        out = mod.apply(variables, xx, explain=explain)
        return out.sum(), out

    (_, j_out), j_grad = jax.value_and_grad(f, has_aux=True)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_grad), t_grad, rtol=1e-4, atol=1e-5)


@needs_reference
@pytest.mark.parametrize("explain", [False, True])
@pytest.mark.parametrize("centered", [True, False])
def test_posnorm_vs_torch(rng, explain, centered):
    import torch

    if centered:
        ref = load_reference("bcos.modules.norms.centered_norms")
        tmod = ref.DetachablePositionNorm2d(8)
        mod = N.DetachablePositionNorm2d(features=8)
    else:
        ref = load_reference("bcos.modules.norms.uncentered_norms.posnorm_uncentered")
        tmod = ref.PositionNormUncentered2d(8)
        mod = N.PositionNormUncentered2d(features=8)
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(rng.random(8).astype(np.float32) + 0.5))
        tmod.bias.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))
    x = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    t_out, t_grad = _torch_out_grad(tmod, x, explain, False)

    variables = {
        "params": {
            "weight": jnp.asarray(tmod.weight.detach().numpy()),
            "bias": jnp.asarray(tmod.bias.detach().numpy()),
        }
    }
    j_out, j_grad = _jax_out_grad(mod, variables, _nhwc(x), explain, False)
    np.testing.assert_allclose(_from_nhwc(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_from_nhwc(j_grad), t_grad, rtol=1e-4, atol=1e-5)


def test_nobias_unaffine_wrappers():
    mod = N.NoBias(N.BatchNormUncentered2d)(features=4)
    x = jnp.ones((2, 3, 3, 4))
    v = mod.init(jax.random.PRNGKey(0), x)
    assert "bias" not in v["params"] and "weight" in v["params"]
    mod2 = N.Unaffine(N.GroupNormUncentered2d)(features=4, num_groups=2)
    v2 = mod2.init(jax.random.PRNGKey(0), x)
    assert "params" not in v2 or not v2.get("params")

"""Pipeline-parallel SimpleViT (parallel/pp_vit.py): the pipelined forward,
grads, train step and explanation must equal the plain model's — same
canonical param tree, GPipe only changes the schedule."""
import numpy as np

import jax
import jax.numpy as jnp

from bcosification_tpu.models import vit as vit_lib
from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.parallel import pp_vit


def _tiny_vit(gap_reorder=False, depth=4):
    vit = vit_lib.SimpleViT(
        image_size=16, patch_size=8, num_classes=10, dim=32, depth=depth,
        heads=4, mlp_dim=64, gap_reorder=gap_reorder, with_logit_layer=True,
    )
    variables = vit.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 6)))
    return vit, variables


def _batch(rng, n=8):
    return jnp.asarray(rng.standard_normal((n, 16, 16, 6)).astype(np.float32))


def test_pick_microbatches():
    assert pp_vit.pick_microbatches(8, 4, 2) == 4  # M=8 -> microbatch 1 not div 2
    assert pp_vit.pick_microbatches(64, 4, 2) == 16
    assert pp_vit.pick_microbatches(6, 2, 1) == 6
    try:
        pp_vit.pick_microbatches(3, 4, 2)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_vit_pipeline_forward_matches_plain(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)  # (data=2, model=4) — pp rides model
    for gap_reorder in (False, True):
        vit, variables = _tiny_vit(gap_reorder=gap_reorder)
        x = _batch(rng)
        want = jax.jit(lambda v, x: vit.apply(v, x, train=False))(variables, x)
        got = jax.jit(
            lambda v, x: pp_vit.vit_pipeline_forward(vit, v, x, mesh)
        )(variables, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
        )


def test_vit_pipeline_ragged_tail_matches_plain(rng):
    """The last validation batch is rarely a multiple of the data axis; the
    pipelined forward pads with repeated real rows (never zeros — B-cos inf
    sqrt-VJP partials) and slices back. Also covers B < n_data."""
    mesh = mesh_lib.make_mesh(model_parallel=4)  # data axis = 2
    vit, variables = _tiny_vit()
    for n in (5, 1):
        x = _batch(rng, n=n)
        want = vit.apply(variables, x, train=False)
        got = jax.jit(
            lambda v, x: pp_vit.vit_pipeline_forward(vit, v, x, mesh)
        )(variables, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
        )
    # an explicit microbatch target that doesn't divide the tail is clamped,
    # not crashed (trainer.pp_microbatches semantics)
    x = _batch(rng, n=6)
    got = jax.jit(
        lambda v, x: pp_vit.vit_pipeline_forward(
            vit, v, x, mesh, n_microbatches=16
        )
    )(variables, x)
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(vit.apply(variables, x, train=False)),
        rtol=2e-5, atol=2e-6,
    )


def test_vitc_conv_stem_pipeline_matches_plain(rng):
    """ViT-C (conv stem) through the pipelined forward: the replicated stem
    path (conv2d_layer/norm2d_layer/act_layer factories) must match the plain
    model too."""
    from functools import partial

    from bcosification_tpu.modules import BcosConv2d, DetachableGELU, norms

    vit = vit_lib.SimpleViT(
        image_size=8, patch_size=1, num_classes=10, dim=32, depth=4,
        heads=4, mlp_dim=64, conv_stem=(8, 16),
        conv2d_layer=partial(BcosConv2d, b=2),
        norm2d_layer=partial(norms.DetachableGroupNorm2d, num_groups=4),
        act_layer=DetachableGELU,
    )
    variables = vit.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 6)))
    mesh = mesh_lib.make_mesh(model_parallel=4)
    x = jnp.asarray(rng.standard_normal((8, 8, 8, 6)).astype(np.float32))
    want = jax.jit(lambda v, x: vit.apply(v, x, train=False))(variables, x)
    got = jax.jit(
        lambda v, x: pp_vit.vit_pipeline_forward(vit, v, x, mesh)
    )(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_vit_pipeline_grads_match_plain(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)
    vit, variables = _tiny_vit()
    x = _batch(rng)

    def loss_plain(params):
        return jnp.sum(vit.apply({"params": params}, x, train=False) ** 2)

    def loss_pp(params):
        return jnp.sum(
            pp_vit.vit_pipeline_forward(vit, {"params": params}, x, mesh) ** 2
        )

    g_plain = jax.jit(jax.grad(loss_plain))(variables["params"])
    g_pp = jax.jit(jax.grad(loss_pp))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_plain), jax.device_get(g_pp),
    )


def test_pipelined_vit_train_step_matches_plain(rng):
    """PipelinedViT drops into make_train_step: one step from the same state
    produces the same params/metrics as the unpipelined model."""
    import optax

    from bcosification_tpu import losses as losses_lib
    from bcosification_tpu.training import steps as steps_lib

    mesh = mesh_lib.make_mesh(model_parallel=4)
    vit, variables = _tiny_vit()
    crit = losses_lib.UniformOffLabelsBCEWithLogitsLoss()
    tx = optax.adam(1e-3)
    batch = {
        "image": _batch(rng),
        "label": jnp.asarray(rng.integers(0, 10, size=(8,)), jnp.int32),
    }

    step_plain = steps_lib.make_train_step(vit, crit, tx, use_agc=True, donate=False)
    step_pp = steps_lib.make_train_step(
        pp_vit.PipelinedViT(vit, mesh), crit, tx, use_agc=True, donate=False
    )
    s0 = steps_lib.create_train_state(variables, tx)
    s_plain, m_plain = step_plain(s0, batch)
    s_pp, m_pp = step_pp(s0, batch)
    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_plain["loss"]), rtol=1e-5
    )
    # Adam normalises by sqrt(v): for near-zero grads the update direction is
    # sensitive to last-ulp grad differences, so allow 1e-5 on the params
    # (the update magnitude is lr=1e-3; observed max delta ~2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        ),
        jax.device_get(s_plain.params), jax.device_get(s_pp.params),
    )


def test_pipelined_vit_explain_matches_plain(rng):
    """Explanation mode (stop-gradient variant) through the pipeline: W(x)
    identical to the plain model's fused VJP."""
    from bcosification_tpu.explain import core as explain_core

    mesh = mesh_lib.make_mesh(model_parallel=4)
    vit, variables = _tiny_vit()
    x = _batch(rng, n=4)
    plain = explain_core.make_explain_fn(vit, with_image=False, fast=False)
    piped = explain_core.make_explain_fn(
        pp_vit.PipelinedViT(vit, mesh), with_image=False, fast=False
    )
    a = plain(variables, x)
    b = piped(variables, x)
    np.testing.assert_allclose(
        np.asarray(b["dynamic_linear_weights"]),
        np.asarray(a["dynamic_linear_weights"]),
        rtol=5e-5, atol=5e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(b["prediction"]), np.asarray(a["prediction"])
    )

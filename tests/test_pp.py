"""Pipeline parallelism: the GPipe schedule over the 'model' axis must equal
the sequential composition of stages — values and gradients — while the
batch stays data-sharded."""
import numpy as np

import jax
import jax.numpy as jnp

from bcosification_tpu.models import vit as vit_lib
from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.parallel import pp as pp_lib


def _stages(rng, n_stages=4, dim=32, tokens=16):
    enc = vit_lib.Encoder(heads=4, dim_head=dim // 4, mlp_dim=64)
    x0 = jnp.ones((1, tokens, dim))
    params = [
        enc.init(jax.random.PRNGKey(i), x0)["params"] for i in range(n_stages)
    ]
    return enc, params


def test_pipeline_matches_sequential(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)  # (data=2, model=4)
    assert pp_lib.pp_size(mesh) == 4
    enc, params = _stages(rng)
    # batch 16: microbatch sizes 16/M must stay divisible by the data axis (2)
    x = jnp.asarray(rng.standard_normal((16, 16, 32)).astype(np.float32))

    def stage_fn(p, x):
        return enc.apply({"params": p}, x, train=False)

    want = x
    for p in params:
        want = stage_fn(p, want)

    stacked = pp_lib.stack_stage_params(params)

    @jax.jit
    def run(stacked, x):
        return pp_lib.pipeline_apply(stage_fn, stacked, x, mesh, n_microbatches=4)

    got = run(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    # one microbatch (pure bubble pipeline) and M=B both still exact
    got1 = jax.jit(
        lambda s, x: pp_lib.pipeline_apply(stage_fn, s, x, mesh, n_microbatches=1)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want), rtol=2e-5, atol=2e-6)
    got8 = jax.jit(
        lambda s, x: pp_lib.pipeline_apply(stage_fn, s, x, mesh, n_microbatches=8)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_pipeline_eight_stages(rng):
    """Full-width ring: 8 stages on a (data=1, model=8) mesh."""
    mesh = mesh_lib.make_mesh(model_parallel=8)
    enc, params = _stages(rng, n_stages=8)
    x = jnp.asarray(rng.standard_normal((8, 16, 32)).astype(np.float32))

    def stage_fn(p, x):
        return enc.apply({"params": p}, x, train=False)

    want = x
    for p in params:
        want = stage_fn(p, want)
    got = jax.jit(
        lambda s, x: pp_lib.pipeline_apply(stage_fn, s, x, mesh, n_microbatches=4)
    )(pp_lib.stack_stage_params(params), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_pipeline_composes_with_tp_3d(rng):
    """3D parallelism on one mesh: GPipe rides a dedicated 'pipe' axis (manual
    ring) while Megatron TP keeps 'model' (left automatic inside shard_map, so
    GSPMD places the per-block psums inside each pipeline tick) and the batch
    stays sharded over 'data' — values AND grads equal the sequential,
    unsharded composition."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bcosification_tpu.parallel import tp as tp_lib

    mesh = mesh_lib.make_mesh(model_parallel=2, pipeline_parallel=2)
    assert mesh.shape == {"data": 2, "pipe": 2, "model": 2}
    assert pp_lib.pp_size(mesh) == 2
    enc, params = _stages(rng, n_stages=2)
    x = jnp.asarray(rng.standard_normal((8, 16, 32)).astype(np.float32))

    def stage_fn(p, x):
        return enc.apply({"params": p}, x, train=False)

    want = x
    for p in params:
        want = stage_fn(p, want)

    # stage axis manual over 'pipe' (in_specs), TP over 'model' carried by the
    # arrays' own shardings (the automatic axis)
    tp_specs = tp_lib.tp_param_specs(params[0])
    stacked = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(
            leaf, NamedSharding(mesh, P(mesh_lib.PIPE_AXIS, *s))
        ),
        pp_lib.stack_stage_params(params),
        tp_specs,
    )
    assert any(  # the TP rules actually sharded something
        "model" in s for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda _, sp: str(sp), params[0], tp_specs)
        )
    )

    @jax.jit
    def run(stacked, x):
        return pp_lib.pipeline_apply(stage_fn, stacked, x, mesh, n_microbatches=4)

    got = run(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def loss_seq(params_list, x):
        h = x
        for p in params_list:
            h = stage_fn(p, h)
        return jnp.sum(h**2)

    def loss_pp(stacked, x):
        return jnp.sum(
            pp_lib.pipeline_apply(stage_fn, stacked, x, mesh, n_microbatches=4) ** 2
        )

    g_seq = pp_lib.stack_stage_params(jax.jit(jax.grad(loss_seq))(params, x))
    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_seq), jax.device_get(g_pp),
    )


def test_pipeline_grads_match_sequential(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)
    enc, params = _stages(rng)
    x = jnp.asarray(rng.standard_normal((8, 16, 32)).astype(np.float32))

    def stage_fn(p, x):
        return enc.apply({"params": p}, x, train=False)

    stacked = pp_lib.stack_stage_params(params)

    def loss_seq(params_list, x):
        h = x
        for p in params_list:
            h = stage_fn(p, h)
        return jnp.sum(h**2)

    def loss_pp(stacked, x):
        return jnp.sum(
            pp_lib.pipeline_apply(stage_fn, stacked, x, mesh, n_microbatches=4) ** 2
        )

    g_seq = jax.jit(jax.grad(loss_seq))(params, x)
    g_seq_stacked = pp_lib.stack_stage_params(g_seq)
    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_seq_stacked), jax.device_get(g_pp),
    )

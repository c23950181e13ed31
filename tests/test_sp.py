"""Sequence parallelism: token-sharded block boundaries must reproduce the
unsharded ViT forward and gradients exactly, and actually shard the
block-boundary activations (composes with TP on the same 'model' axis)."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bcosification_tpu.models import vit as vit_lib
from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.parallel import sp as sp_lib
from bcosification_tpu.parallel import tp as tp_lib


def _tiny_vit():
    # 16/4 -> 16 tokens, divisible by mp=4
    return vit_lib.SimpleViT(
        image_size=16, patch_size=4, num_classes=7, dim=32, depth=2, heads=4,
        mlp_dim=64,
    )


def test_sp_forward_and_grads_match_unsharded(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)  # (data=2, model=4)
    assert sp_lib.sp_size(mesh) == 4
    model = _tiny_vit()
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    want = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def sp_fwd(v, x):
        return sp_lib.sequence_parallel_apply(model, v, x, mesh, train=False)

    got = sp_fwd(variables, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    # gradients through the sharding constraints match too
    def loss_plain(p):
        return jnp.sum(model.apply({"params": p}, x, train=False) ** 2)

    def loss_sp(p):
        return jnp.sum(
            sp_lib.sequence_parallel_apply(
                model, {"params": p}, x_sh, mesh, train=False
            )
            ** 2
        )

    g_ref = jax.jit(jax.grad(loss_plain))(variables["params"])
    g_sp = jax.jit(jax.grad(loss_sp))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_ref), jax.device_get(g_sp),
    )


def test_sp_composes_with_tp(rng):
    """TP-sharded params + SP-sharded activations on the same mesh."""
    mesh = mesh_lib.make_mesh(model_parallel=4)
    model = _tiny_vit()
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    want = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

    p_tp = tp_lib.shard_params(variables["params"], mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(
        lambda p, x: sp_lib.sequence_parallel_apply(
            model, {"params": p}, x, mesh, train=False
        )
    )(p_tp, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_sp_ragged_tokens_fall_back(rng):
    """Token counts not divisible by mp must still run (constraint skipped)."""
    mesh = mesh_lib.make_mesh(model_parallel=8)  # 16 tokens % 8 == 0 ... use 12x16
    model = vit_lib.SimpleViT(
        image_size=(12, 16), patch_size=4, num_classes=5, dim=32, depth=1,
        heads=4, mlp_dim=64,
    )  # 3*4 = 12 tokens, not divisible by 8
    x = jnp.asarray(rng.standard_normal((8, 12, 16, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    want = model.apply(variables, x, train=False)
    got = jax.jit(
        lambda v, x: sp_lib.sequence_parallel_apply(model, v, x, mesh, train=False)
    )(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

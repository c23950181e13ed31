"""Tensor parallelism over the 'model' mesh axis: Megatron-style sharding of
ViT attention heads + MLP hidden must (a) actually shard the params and
(b) reproduce the replicated forward and gradients exactly."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bcosification_tpu.models import vit as vit_lib
from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.parallel import tp as tp_lib


def _tiny_vit():
    return vit_lib.SimpleViT(
        image_size=16, patch_size=4, num_classes=7, dim=32, depth=2, heads=4,
        mlp_dim=64,
    )


def test_tp_forward_and_grads_match_replicated(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)  # (data=2, model=4)
    assert tp_lib.tp_size(mesh) == 4

    model = _tiny_vit()
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    def fwd(p, x):
        return model.apply({"params": p}, x, train=False)

    want = jax.jit(fwd)(params, x)

    specs = tp_lib.tp_param_specs(params)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded_paths = ["/".join(str(k.key) for k in path)
                     for path, s in flat if s != P()]
    # every encoder block contributes qkv/out/linear1/linear2 weights
    assert any("to_qkv" in p for p in sharded_paths)
    assert any("to_out" in p for p in sharded_paths)
    assert any("linear1" in p for p in sharded_paths)
    assert any("linear2" in p for p in sharded_paths)

    p_tp = tp_lib.shard_params(params, mesh, specs)
    # (a) params are REALLY sharded: a qkv weight lives in 4 distinct pieces
    qkv = p_tp["encoder_0"]["attn"]["to_qkv"]["weight"]
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 96 // 4)}, shard_shapes

    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(fwd)(p_tp, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    # (b) gradients under TP match the replicated gradients
    def loss(p, x):
        return jnp.sum(fwd(p, x) ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, x)
    g_tp = jax.jit(jax.grad(loss))(p_tp, x_sh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_ref), jax.device_get(g_tp),
    )


def test_tp_clip_block_sharded_and_exact(rng):
    """The CLIP tower's flat-named block linears (attn_in_proj, mlp_c_fc,
    ... — clip/model.py:283-308) must get real TP specs (r5 review: the old
    exact-name gate matched neither naming scheme, silently replicating
    every CLIP weight) and the sharded forward/grads must be exact."""
    from bcosification_tpu.clip.model import ResidualAttentionBlock

    mesh = mesh_lib.make_mesh(model_parallel=4)
    model = ResidualAttentionBlock(d_model=32, n_head=4)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    specs = tp_lib.tp_param_specs(params)
    assert specs["attn_in_proj"]["weight"] == P(None, "model")
    assert specs["attn_out_proj"]["weight"] == P("model", None)
    assert specs["mlp_c_fc"]["weight"] == P(None, "model")
    assert specs["mlp_c_proj"]["weight"] == P("model", None)
    assert specs["ln_1"]["weight"] == P()  # CLIPLayerNorm is torch-named

    def fwd(p, xx):
        return model.apply({"params": p}, xx, train=False)

    want = jax.jit(fwd)(params, x)
    p_tp = tp_lib.shard_params(params, mesh, specs)
    got = jax.jit(fwd)(p_tp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def loss(p, xx):
        return jnp.sum(fwd(p, xx) ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, x)
    g_tp = jax.jit(jax.grad(loss))(p_tp, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_ref), jax.device_get(g_tp),
    )


def test_tp_specs_leave_non_block_params_replicated(rng):
    model = _tiny_vit()
    x = jnp.ones((1, 16, 16, 6))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    specs = tp_lib.tp_param_specs(params)
    assert specs["to_patch_embedding_linear"]["weight"] == P()
    assert specs["linear_head_linear"]["weight"] == P()

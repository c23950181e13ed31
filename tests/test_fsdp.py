"""FSDP (ZeRO-3) over the 'data' axis: sharding the TrainState must
(a) actually place 1/n-sized shards per device, (b) leave the unchanged
train step numerically identical to the replicated DP run, and (c) keep
small leaves (BN stats, per-channel vectors) replicated."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bcosification_tpu.losses import UniformOffLabelsBCEWithLogitsLoss
from bcosification_tpu.parallel import fsdp as fsdp_lib
from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.training import steps as steps_lib

# the test model is tiny (inplanes=8), so shard anything >= 256 elements;
# per-channel BN vectors (<= 64 channels) stay under it, conv kernels above
MIN_SIZE = 256


def _tiny_flagship():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship

    return _flagship(
        input_size=32, arch="resnet50", inplanes=8, num_classes=10,
        layers=("bottleneck", (1, 1)),
    )


def test_fsdp_spec_for_shape():
    # largest divisible axis wins; ties break to the later axis
    assert fsdp_lib.fsdp_spec_for_shape((3, 3, 64, 128), 8, min_size=1) == P(
        None, None, None, "data"
    )
    assert fsdp_lib.fsdp_spec_for_shape((256, 128), 8, min_size=1) == P("data", None)
    assert fsdp_lib.fsdp_spec_for_shape((128, 128), 8, min_size=1) == P(None, "data")
    # indivisible axes -> replicated
    assert fsdp_lib.fsdp_spec_for_shape((7, 9), 8, min_size=1) == P()
    # below min_size -> replicated even if divisible
    assert fsdp_lib.fsdp_spec_for_shape((64,), 8) == P()


def test_fsdp2d_composes_with_tp(rng):
    """2D weight sharding (TP over 'model' + FSDP over 'data'): forward and
    grads match the replicated run, and a qkv weight lives in 8 pieces."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from bcosification_tpu.models import vit as vit_lib
    from bcosification_tpu.parallel import tp as tp_lib

    mesh = mesh_lib.make_mesh(model_parallel=4)  # (data=2, model=4)
    model = vit_lib.SimpleViT(
        image_size=16, patch_size=4, num_classes=7, dim=32, depth=2, heads=4,
        mlp_dim=64,
    )
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    want = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))(params, x)

    specs2d = fsdp_lib.fsdp2d_specs(
        params, mesh, tp_lib.tp_param_specs(params), min_size=256
    )
    # qkv: TP claims the out dim, FSDP adds 'data' on the in dim -> 2D
    assert specs2d["encoder_0"]["attn"]["to_qkv"]["weight"] == P("data", "model")
    p2d = fsdp_lib.shard_state(params, mesh, specs2d)
    qkv = p2d["encoder_0"]["attn"]["to_qkv"]["weight"]
    assert {s.data.shape for s in qkv.addressable_shards} == {(16, 24)}

    x_sh = jax.device_put(
        x, NamedSharding(mesh, P("data"))
    )
    got = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))(p2d, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    g_ref = jax.jit(
        jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x, train=False) ** 2))
    )(params)
    g_2d = jax.jit(
        jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x_sh, train=False) ** 2))
    )(p2d)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_ref), jax.device_get(g_2d),
    )


def test_fsdp_train_step_matches_replicated(rng):
    import optax

    net, variables = _tiny_flagship()
    mesh = mesh_lib.make_mesh(8)
    n = 8

    tx = optax.adam(1e-3)
    train_step = steps_lib.make_train_step(
        net, UniformOffLabelsBCEWithLogitsLoss(), tx,
        use_agc=True, ema_decay=0.99, ema_steps=1,
    )
    batch = {
        "image": jnp.asarray(rng.standard_normal((16, 32, 32, 6)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 10, size=(16,)).astype(np.int32)),
    }
    batch = mesh_lib.shard_batch(batch, mesh)

    # replicated DP run (the baseline); create_train_state copies the
    # variables leaves, so the donating step can't delete them between runs
    state_rep = steps_lib.create_train_state(variables, tx, with_ema=True)
    state_rep = mesh_lib.replicate(state_rep, mesh)
    rep1, m_rep = train_step(state_rep, batch)
    rep2, m_rep2 = train_step(rep1, batch)

    # FSDP run: SAME step function, state sharded over 'data'
    state = steps_lib.create_train_state(variables, tx, with_ema=True)
    specs = fsdp_lib.fsdp_state_specs(state, mesh, min_size=MIN_SIZE)
    state = fsdp_lib.shard_state(state, mesh, specs)

    # (a) big leaves really live in 8 device-local pieces
    assert any(
        s != P() for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
    ), "no leaf got sharded"
    big = max(jax.tree_util.tree_leaves(state.params), key=lambda l: l.size)
    assert big.size >= MIN_SIZE
    assert all(
        int(np.prod(s.data.shape)) == big.size // n for s in big.addressable_shards
    ), big.sharding
    glob, local_bytes = fsdp_lib.shard_size(state.params)
    assert local_bytes < 0.6 * glob, (glob, local_bytes)

    # (c) batch_stats stay replicated under the same threshold
    bs_specs = fsdp_lib.fsdp_state_specs(state_rep.batch_stats, mesh, min_size=MIN_SIZE)
    assert all(
        s == P() for s in jax.tree_util.tree_leaves(
            bs_specs, is_leaf=lambda x: isinstance(x, P)
        )
    )

    # (b) two steps match the replicated run (params, EMA shadows, metrics)
    fs1, m_fs = train_step(state, batch)
    fs2, m_fs2 = train_step(fs1, batch)
    np.testing.assert_allclose(float(m_fs["loss"]), float(m_rep["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_fs2["loss"]), float(m_rep2["loss"]), rtol=1e-6)
    for a, b in (
        (rep2.params, fs2.params),
        (rep2.ema_params, fs2.ema_params),
        (rep2.batch_stats, fs2.batch_stats),
    ):
        jax.tree_util.tree_map(
            lambda u, v: np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), rtol=1e-5, atol=1e-7
            ),
            jax.device_get(a), jax.device_get(b),
        )

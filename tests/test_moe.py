"""BcosMoE: routing parity vs per-token expert evaluation, explain-mode value
invariance + completeness, capacity overflow contract, and expert-parallel
sharding parity on the 8-device mesh."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bcosification_tpu.modules.moe import (
    BcosMoE,
    ep_param_specs,
    load_balancing_loss,
)
from bcosification_tpu.ops import bcos as bcos_ops
from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.parallel import tp as tp_lib


def _build(rng, E=4, d=16, F=24, **kw):
    moe = BcosMoE(num_experts=E, features=F, **kw)
    x = jnp.asarray(rng.standard_normal((2, 8, d)).astype(np.float32))
    params = moe.init(jax.random.PRNGKey(0), x)["params"]
    return moe, params, x


def test_moe_matches_per_token_expert(rng):
    # capacity >= all tokens: every token routed, so the dense-dispatch MoE
    # must equal evaluating each token through its argmax expert times gate
    moe, params, x = _build(rng, capacity_factor=8.0)
    y = moe.apply({"params": params}, x)

    xt = x.reshape(-1, x.shape[-1])
    logits = xt @ params["router"]
    probs = jax.nn.softmax(logits, -1)
    idx = jnp.argmax(probs, -1)
    gate = jnp.max(probs, -1)
    want = jnp.stack(
        [
            gate[n] * bcos_ops.bcos_linear(xt[n], params["experts"][idx[n]], b=2.0)
            for n in range(xt.shape[0])
        ]
    ).reshape(y.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_moe_explain_values_identical_and_complete(rng):
    moe, params, x = _build(rng, capacity_factor=8.0)
    y = moe.apply({"params": params}, x)
    y_expl = moe.apply({"params": params}, x, explain=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_expl), rtol=0, atol=0)

    # completeness: with gate + dynamic scale detached the layer is locally
    # linear, so the JVP along x reproduces the output exactly
    def f(x):
        return moe.apply({"params": params}, x, explain=True)

    _, jvp = jax.jvp(f, (x,), (x,))
    np.testing.assert_allclose(np.asarray(jvp), np.asarray(y), rtol=2e-4, atol=1e-5)


def test_moe_overflow_tokens_are_dropped_to_zero(rng):
    # capacity 1 slot/expert: with 16 tokens on 4 experts most tokens
    # overflow; their outputs must be exactly zero (residual-path contract)
    moe, params, x = _build(rng, capacity_factor=0.25)  # C = ceil(16/4*0.25)=1
    y = np.asarray(moe.apply({"params": params}, x)).reshape(-1, 24)

    xt = x.reshape(-1, x.shape[-1])
    idx = np.asarray(jnp.argmax(xt @ params["router"], -1))
    kept = set()
    n_zero = 0
    for n in range(xt.shape[0]):
        if idx[n] in kept:
            assert np.all(y[n] == 0.0), f"overflow token {n} not zeroed"
            n_zero += 1
        else:
            kept.add(idx[n])
    assert n_zero >= 16 - 4


def test_moe_load_balancing_loss(rng):
    # perfect balance -> exactly 1; full collapse -> ~E
    E, N = 4, 16
    probs = jnp.full((N, E), 1.0 / E)
    idx = jnp.arange(N) % E
    np.testing.assert_allclose(float(load_balancing_loss(probs, idx)), 1.0, rtol=1e-6)
    collapsed = jax.nn.one_hot(jnp.zeros(N, jnp.int32), E) * 0.97 + 0.01
    np.testing.assert_allclose(
        float(load_balancing_loss(collapsed, jnp.zeros(N, jnp.int32))),
        4 * 0.98, rtol=1e-5,
    )

    # the module sows what the loss needs
    moe, params, x = _build(rng)
    _, inter = moe.apply({"params": params}, x, mutable=["intermediates"])
    probs = inter["intermediates"]["router_probs"][0]
    idx = inter["intermediates"]["expert_idx"][0]
    aux = float(load_balancing_loss(probs, idx))
    assert np.isfinite(aux) and aux >= 1.0 - 1e-6


def test_moe_vit_integration(rng):
    """SimpleViT(moe_experts=4): runs, explain-invariant values, finite grads,
    and ep_param_specs finds the nested expert leaves."""
    from jax.sharding import PartitionSpec
    from bcosification_tpu.models import vit as vit_lib

    model = vit_lib.SimpleViT(
        image_size=16, patch_size=4, num_classes=5, dim=32, depth=2, heads=4,
        mlp_dim=48, moe_experts=4,
    )
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert params["encoder_0"]["ff"]["moe2"]["experts"].shape == (4, 48, 32)

    y = model.apply({"params": params}, x, train=False)
    y_expl = model.apply({"params": params}, x, train=False, explain=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_expl), rtol=0, atol=0)

    g = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, x, train=False) ** 2)
    )(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )

    specs = ep_param_specs(params)
    assert specs["encoder_0"]["ff"]["moe2"]["experts"] == PartitionSpec(
        "model", None, None
    )
    assert specs["encoder_0"]["attn"]["to_qkv"]["weight"] == PartitionSpec()


def test_moe_ff_inherits_b_and_rejects_bias(rng):
    """MoEFeedForward reads b from the injected linear partial and refuses
    biased linears (BcosMoE experts are bias-free)."""
    import functools

    from bcosification_tpu.models.vit import MoEFeedForward
    from bcosification_tpu.modules.bcos_layers import BcosLinear

    x = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))

    ff_b2 = MoEFeedForward(
        4, 24, 16, linear_layer=functools.partial(BcosLinear, b=2.0)
    )
    ff_b1 = MoEFeedForward(
        4, 24, 16, linear_layer=functools.partial(BcosLinear, b=1.0)
    )
    p = ff_b2.init(jax.random.PRNGKey(0), x)["params"]
    y2 = ff_b2.apply({"params": p}, x)
    y1 = ff_b1.apply({"params": p}, x)  # same params, different b
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), (
        "experts ignored the configured b"
    )

    ff_bias = MoEFeedForward(
        4, 24, 16, linear_layer=functools.partial(BcosLinear, use_bias=True)
    )
    with np.testing.assert_raises(ValueError):
        ff_bias.init(jax.random.PRNGKey(0), x)


def test_moe_expert_parallel_matches_unsharded(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)  # (data=2, model=4)
    moe, params, x = _build(rng, E=8, capacity_factor=8.0)
    want = jax.jit(lambda p, x: moe.apply({"params": p}, x))(params, x)

    specs = ep_param_specs(params, n_shards=4)
    assert specs["experts"] == P("model", None, None)
    assert specs["router"] == P()
    with np.testing.assert_raises(ValueError):  # 8 experts % 3 != 0
        ep_param_specs(params, n_shards=3)
    p_ep = tp_lib.shard_params(params, mesh, specs)
    shard_shapes = {s.data.shape for s in p_ep["experts"].addressable_shards}
    assert shard_shapes == {(8 // 4, 16, 24)}, shard_shapes

    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, x: moe.apply({"params": p}, x))(p_ep, x_sh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )

    # gradients under expert parallelism match the unsharded gradients
    def loss(p, x):
        return jnp.sum(moe.apply({"params": p}, x) ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, x)
    g_ep = jax.jit(jax.grad(loss))(p_ep, x_sh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        jax.device_get(g_ref), jax.device_get(g_ep),
    )


def _route_reference(params, x, *, K, cf, b=2.0, renormalize=True):
    """Greedy GShard routing in plain python: all rank-0 choices claim
    capacity before any rank-1 choice, tokens in order within a rank."""
    xt = np.asarray(x.reshape(-1, x.shape[-1]))
    E = params["router"].shape[-1]
    N = xt.shape[0]
    probs = np.asarray(jax.nn.softmax(jnp.asarray(xt) @ params["router"], -1))
    idx = np.argsort(-probs, axis=-1, kind="stable")[:, :K]
    gates = np.take_along_axis(probs, idx, axis=-1)
    if K > 1 and renormalize:
        gates = gates / gates.sum(-1, keepdims=True)
    C = int(np.ceil(K * N / E * cf))
    counts = np.zeros(E, np.int64)
    out = np.zeros((N, params["experts"].shape[-1]), np.float32)
    for j in range(K):
        for n in range(N):
            e = int(idx[n, j])
            if counts[e] < C:
                counts[e] += 1
                y = bcos_ops.bcos_linear(
                    jnp.asarray(xt[n]), params["experts"][e], b=b
                )
                out[n] += gates[n, j] * np.asarray(y)
    return out


def test_moe_top2_matches_greedy_reference(rng):
    # generous capacity: nothing drops; output = sum of the 2 best experts'
    # outputs weighted by the renormalised top-2 gates
    moe, params, x = _build(rng, E=4, capacity_factor=8.0, top_k=2)
    y = np.asarray(moe.apply({"params": params}, x)).reshape(-1, 24)
    want = _route_reference(params, x, K=2, cf=8.0)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def test_moe_top2_priority_under_capacity_pressure(rng):
    # tight capacity: the dense dispatch must drop exactly the assignments
    # the greedy rank-major reference drops (first choices beat second)
    moe, params, x = _build(rng, E=4, capacity_factor=0.6, top_k=2)
    y = np.asarray(moe.apply({"params": params}, x)).reshape(-1, 24)
    want = _route_reference(params, x, K=2, cf=0.6)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)
    # and pressure actually existed (some token lost a choice)
    y_full = _route_reference(params, x, K=2, cf=8.0)
    assert not np.allclose(y, y_full), "capacity pressure test had no drops"


def test_moe_top2_raw_gates(rng):
    moe, params, x = _build(
        rng, E=4, capacity_factor=8.0, top_k=2, renormalize_gates=False
    )
    y = np.asarray(moe.apply({"params": params}, x)).reshape(-1, 24)
    want = _route_reference(params, x, K=2, cf=8.0, renormalize=False)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def test_moe_top2_explain_values_identical_and_complete(rng):
    moe, params, x = _build(rng, E=4, capacity_factor=8.0, top_k=2)
    y = moe.apply({"params": params}, x)
    y_expl = moe.apply({"params": params}, x, explain=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_expl), rtol=0, atol=0)

    def f(x):
        return moe.apply({"params": params}, x, explain=True)

    _, jvp = jax.jvp(f, (x,), (x,))
    np.testing.assert_allclose(np.asarray(jvp), np.asarray(y), rtol=2e-4, atol=1e-5)

    # finite grads in both modes (dropped slots must not NaN: ones-fill)
    for kw in ({}, {"explain": True}):
        g = jax.grad(
            lambda p: jnp.sum(moe.apply({"params": p}, x, **kw) ** 2)
        )(params)
        assert all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree_util.tree_leaves(g)
        )


def test_moe_top2_expert_parallel_matches_unsharded(rng):
    mesh = mesh_lib.make_mesh(model_parallel=4)
    moe, params, x = _build(rng, E=8, capacity_factor=8.0, top_k=2)
    want = jax.jit(lambda p, x: moe.apply({"params": p}, x))(params, x)
    p_ep = tp_lib.shard_params(params, mesh, ep_param_specs(params, n_shards=4))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, x: moe.apply({"params": p}, x))(p_ep, x_sh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_moe_vit_top2_integration(rng):
    from bcosification_tpu.models import vit as vit_lib

    model = vit_lib.SimpleViT(
        image_size=16, patch_size=4, num_classes=5, dim=32, depth=1, heads=4,
        mlp_dim=48, moe_experts=4, moe_top_k=2,
    )
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x, train=False)
    y_expl = model.apply({"params": params}, x, train=False, explain=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_expl), rtol=0, atol=0)
    # top-2 sows the full choice matrix
    _, inter = model.apply(
        {"params": params}, x, train=False, mutable=["intermediates"]
    )
    top_idx = inter["intermediates"]["encoder_0"]["ff"]["moe2"]["top_idx"][0]
    assert top_idx.shape[-1] == 2

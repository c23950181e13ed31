"""B-cos Mixture-of-Experts with top-k capacity-factor routing — expert-parallel.

Beyond-reference: shrebox/B-cosification has no MoE anywhere; this module
exists so the framework's scaling story covers expert parallelism alongside
DP/TP/SP/PP/FSDP (parallel/). It replaces a B-cos linear whose output feeds
a residual add — e.g. the ViT FFN's projection (models/vit.MoEFeedForward) —
scaling parameter count with `num_experts` at constant per-token FLOPs.
It must be the LAST layer before the residual: capacity-dropped tokens emit
exact-zero rows, and a B-cos/LayerNorm layer consuming them would NaN its
gradients (||x||=0 sqrt-VJP is inf; 0*inf). See MoEFeedForward's docstring.

TPU-native formulation: no ragged gather/scatter — routing is expressed as
two dense one-hot einsums (dispatch and combine) over an (experts, capacity)
buffer, the canonical XLA/GSPMD MoE form. With the expert axis of the weights
sharded over the mesh's 'model' axis (``ep_param_specs``), GSPMD turns the
dispatch/combine einsums into the all-to-alls of classic expert parallelism;
each device computes only its experts.

B-cos semantics: each expert is a `bcos_linear` (ops/bcos.py) — so the layer
stays a dynamic linear module. In explain mode the router gate is detached
(like attention's q/k and the B-cos dynamic scale): the layer then acts as
the fixed linear map gate·W_e(x), values identical between modes, and the
completeness property (x · ∇x) == y holds for the bias-free layer
(tests/test_moe.py).

Capacity: each expert processes at most ``ceil(tokens/experts) *
capacity_factor`` tokens; overflow tokens produce zero output (callers keep
them on the residual path, the standard switch-transformer contract).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bcosification_tpu.ops import bcos as bcos_ops

__all__ = ["BcosMoE", "ep_param_specs", "load_balancing_loss"]


def load_balancing_loss(router_probs: jax.Array, expert_idx: jax.Array) -> jax.Array:
    """Switch-transformer auxiliary loss: E * sum_e f_e * P_e.

    f_e = fraction of tokens routed to expert e (hard assignment),
    P_e = mean router probability for e. Minimised (=1) at perfect balance;
    add `aux * coeff` (coeff ~1e-2) to the task loss when training a BcosMoE.

    router_probs: (N, E) softmax outputs; expert_idx: (N,) argmax routes.
    """
    E = router_probs.shape[-1]
    f = jnp.mean(jax.nn.one_hot(expert_idx, E, dtype=router_probs.dtype), axis=0)
    p = jnp.mean(router_probs, axis=0)
    return E * jnp.sum(f * p)


class BcosMoE(nn.Module):
    """Top-k-routed mixture of B-cos linear experts over the last axis.

    ``top_k=1`` is switch-transformer routing (the default, raw max-prob
    gate). ``top_k>1`` routes each token to its k best experts with
    GShard-style priority — ALL first choices claim capacity slots before
    any second choice, so over-capacity pressure drops lower choices first —
    and (by default) Mixtral-style gates renormalised over the selected k.
    Capacity scales with k: each expert takes at most
    ``ceil(k * tokens / experts * capacity_factor)`` assignments.
    """

    num_experts: int
    features: int
    b: float = 2.0
    capacity_factor: float = 1.25
    normalize_weights: bool = True
    top_k: int = 1
    renormalize_gates: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        E, F, K = self.num_experts, self.features, self.top_k
        assert 1 <= K <= E, (K, E)
        d = x.shape[-1]
        lead = x.shape[:-1]
        N = int(np.prod(lead))
        xt = x.reshape(N, d)

        router = self.param(
            "router", nn.initializers.normal(0.02), (d, E), jnp.float32
        )
        experts = self.param(
            "experts",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (E, d, F),
            jnp.float32,
        )

        logits = xt.astype(jnp.float32) @ router
        probs = jax.nn.softmax(logits, axis=-1)
        gates, top_idx = jax.lax.top_k(probs, K)  # both (N, K)
        if K > 1 and self.renormalize_gates:
            gates = gates / jnp.sum(gates, axis=-1, keepdims=True)
        if explain:
            # the gate is a modulation, not part of the linear map — detach it
            # exactly like the B-cos dynamic scale / attention q,k
            gates = jax.lax.stop_gradient(gates)
        # for load_balancing_loss: apply with mutable=["intermediates"]
        # (expert_idx stays the FIRST choice — the aux loss balances primary
        # assignments, the GShard/switch convention, also under top-k)
        self.sow("intermediates", "router_probs", probs)
        self.sow("intermediates", "expert_idx", top_idx[:, 0])
        if K > 1:
            self.sow("intermediates", "top_idx", top_idx)

        # flatten (token, choice) assignments CHOICE-MAJOR: the cumsum below
        # then hands out each expert's capacity to all rank-0 choices before
        # any rank-1 choice (GShard priority). M = K*N assignments.
        idx_m = top_idx.T.reshape(K * N)  # (M,)

        C = int(np.ceil(K * N / E * self.capacity_factor))
        onehot = jax.nn.one_hot(idx_m, E, dtype=jnp.int32)  # (M, E)
        # position of each assignment within its expert's buffer (0-based)
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1  # (M, E), -1 where unrouted
        pos_in_expert = jnp.sum(pos * onehot, axis=-1)  # (M,)
        keep = (pos_in_expert >= 0) & (pos_in_expert < C)
        # dispatch tensor (M, E, C): 1 where assignment m lands in slot (e, c)
        dispatch = (
            onehot[:, :, None]
            * jax.nn.one_hot(jnp.clip(pos_in_expert, 0, C - 1), C, dtype=jnp.int32)[
                :, None, :
            ]
            * keep[:, None, None]
        ).astype(x.dtype)

        # Assignment (k, n) carries token n, so collapsing the choice axis
        # first lets the dispatch/combine einsums run over N rows instead of
        # K*N (no K-fold tile of the activations, 1/K the contraction FLOPs).
        # Exact: each (e, c) slot is claimed by at most one assignment, so
        # the collapse only folds zeros into the sums.
        dispatch_n = dispatch.reshape(K, N, E, C).sum(axis=0)  # (N, E, C)

        # (E, C, d): each expert's token buffer. Empty slots are filled with
        # ones, NOT zeros: combine ignores them either way, but an all-zero
        # row hits ||x||=0 whose sqrt-VJP partial is inf, and the zero
        # cotangent times inf would NaN the expert weight grads (0*inf)
        xe = jnp.einsum("nec,nd->ecd", dispatch_n, xt)
        occupied = jnp.einsum("nec->ec", dispatch_n)  # 1 where a token landed
        xe = xe + (1.0 - occupied)[..., None].astype(x.dtype)
        ye = jax.vmap(
            lambda w, xs: bcos_ops.bcos_linear(
                xs,
                w,
                b=self.b,
                normalize_weights=self.normalize_weights,
                explain=explain,
            )
        )(experts.astype(x.dtype), xe)  # (E, C, F)
        combine_n = jnp.einsum(
            "knec,kn->nec",
            dispatch.reshape(K, N, E, C),
            gates.T.astype(x.dtype),
        )
        yt = jnp.einsum("nec,ecf->nf", combine_n, ye)  # (N, F)
        return yt.reshape(*lead, F)


def ep_param_specs(params, axis: str = "model", n_shards: Optional[int] = None):
    """PartitionSpecs sharding every BcosMoE 'experts' leaf over ``axis``.

    Apply with parallel.tp.shard_params(params, mesh, specs). The router and
    everything else stays replicated. Pass ``n_shards=mesh.shape[axis]`` to
    fail loudly here (with the offending expert count) instead of deep inside
    jax when num_experts is not a multiple of the mesh axis.
    """
    from jax.sharding import PartitionSpec as P

    def spec(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys and keys[-1] == "experts" and getattr(leaf, "ndim", 0) == 3:
            if n_shards is not None and leaf.shape[0] % n_shards != 0:
                raise ValueError(
                    f"expert parallelism: num_experts={leaf.shape[0]} at "
                    f"{'/'.join(keys)} is not divisible by the '{axis}' "
                    f"mesh axis size {n_shards}"
                )
            return P(axis, None, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)

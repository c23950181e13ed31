"""Fully-sharded data parallelism (ZeRO-3) over the mesh's 'data' axis.

The reference scales only via DDP with fully replicated parameters and
optimizer state (`/root/reference/bcos/training/trainer.py:915-918`). This
module is a TPU-native extension beyond that: parameters, Adam moments and
EMA shadows are *sharded* across the data axis, so per-chip state memory
drops by ~1/n_data — the enabler for training configurations whose optimizer
state does not fit one chip (ViT-L+, CLIP towers at large width).

Mechanics (GSPMD, not hand-written collectives): every large leaf of the
TrainState is placed with a NamedSharding that splits its largest divisible
axis over 'data'. The train step itself is unchanged — XLA propagates the
shardings, all-gathers each weight just before use, and reduce-scatters the
gradients back into the sharded layout (this is exactly the ZeRO-3 schedule,
expressed as layout annotations instead of NCCL calls). Small leaves
(BN scales/stats, biases, the step counter) stay replicated: gathering them
costs more latency than their memory is worth.

Use::

    specs = fsdp_state_specs(state, mesh)
    state = shard_state(state, mesh, specs)
    state, metrics = train_step(state, shard_batch(batch, mesh))  # unchanged

Validated on the 8-virtual-device CPU mesh: identical losses/params vs the
replicated DP run, with per-device shards 1/8 the parameter size
(tests/test_fsdp.py) and in the driver dryrun (__graft_entry__.py).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bcosification_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "fsdp_spec_for_shape",
    "fsdp_state_specs",
    "fsdp2d_specs",
    "shard_state",
    "shard_size",
]

# Leaves smaller than this stay replicated: the all-gather latency of many
# tiny tensors outweighs the memory saved (per-channel BN vectors etc.).
MIN_LEAF_SIZE = 2**13


def _best_axis(shape, n_shards: int, assigned=None):
    """Largest n_shards-divisible axis not already assigned; None if none.

    Ties break toward the LAST such axis: for conv kernels (HWIO) and linear
    weights (in, out) that is the output-feature axis, which keeps each shard
    a contiguous block of output channels (cheap concatenation order for the
    all-gather).
    """
    best = None
    for ax, dim in enumerate(shape):
        if assigned is not None and assigned[ax] is not None:
            continue
        if dim % n_shards == 0 and dim >= n_shards:
            if best is None or dim >= shape[best]:
                best = ax
    return best


def fsdp_spec_for_shape(
    shape, n_shards: int, min_size: int = MIN_LEAF_SIZE
) -> P:
    """PartitionSpec sharding the largest n_shards-divisible axis over 'data'
    (see _best_axis for the tie-break)."""
    if int(np.prod(shape)) < min_size:
        return P()
    best = _best_axis(shape, n_shards)
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def fsdp_state_specs(
    tree: Any, mesh: Mesh, min_size: int = MIN_LEAF_SIZE
) -> Any:
    """Spec pytree for a TrainState (or any pytree): shape-based rules.

    Optimizer moments, EMA shadows and params share shapes, so the same rule
    gives them the same layout — the ZeRO invariant that the update for a
    shard is computable locally after the grad reduce-scatter.
    """
    n = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda leaf: fsdp_spec_for_shape(np.shape(leaf), n, min_size), tree
    )


def fsdp2d_specs(
    tree: Any, mesh: Mesh, base_specs: Any, min_size: int = MIN_LEAF_SIZE
) -> Any:
    """2D weight sharding: add a 'data'-axis shard on top of existing specs.

    The scaling-book standard for large transformers — tensor-parallel specs
    (parallel/tp.py or moe.ep_param_specs) claim one dim per weight over
    'model'; this adds 'data' on the largest still-unassigned divisible dim,
    so each weight lives in n_data * n_model pieces. Leaves whose base spec
    claims every shardable dim (or that are too small) keep their base spec.
    """
    n = mesh.shape[DATA_AXIS]

    def leaf(spec, x):
        shape = np.shape(x)
        if int(np.prod(shape)) < min_size:
            return spec
        assigned = list(spec) + [None] * (len(shape) - len(spec))
        best = _best_axis(shape, n, assigned)
        if best is None:
            return spec
        assigned[best] = DATA_AXIS
        return P(*assigned)

    return jax.tree_util.tree_map(
        leaf, base_specs, tree, is_leaf=lambda x: isinstance(x, P)
    )


def shard_state(tree: Any, mesh: Mesh, specs: Optional[Any] = None) -> Any:
    """device_put each leaf with its FSDP spec (replicated where P())."""
    if specs is None:
        specs = fsdp_state_specs(tree, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def shard_size(tree: Any) -> tuple[int, int]:
    """(global_bytes, addressable_bytes_on_device0) — the memory win proof."""
    glob = 0
    local = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        glob += leaf.nbytes
        if hasattr(leaf, "addressable_shards"):
            shards = [
                s for s in leaf.addressable_shards if s.device == jax.devices()[0]
            ]
            local += sum(int(np.prod(s.data.shape)) * leaf.dtype.itemsize for s in shards)
        else:
            local += leaf.nbytes
    return glob, local

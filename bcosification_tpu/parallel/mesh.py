"""Device mesh + sharding helpers.

The reference scales exclusively via DDP (PL `strategy="ddp..."`,
`/root/reference/bcos/training/trainer.py:915-918`; NCCL allreduce). The
TPU-native equivalent is a single `jax.sharding.Mesh` with a 'data' axis:
batches are sharded over it, parameters replicated, and XLA inserts the psum
of gradients over ICI (DP == pjit with batch-sharded inputs). A second 'model'
axis is provisioned for tensor-parallel extensions.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_local",
    "replicate",
    "local_device_count",
    "is_main_process",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    pipeline_parallel: int = 1,
) -> Mesh:
    """(data, model) mesh; with ``pipeline_parallel`` > 1, (data, pipe, model).

    The third axis lets GPipe own a ring ('pipe') while TP/SP/EP keep 'model'
    — the composition docs/SCALING.md describes. Keep 'model' innermost
    (ICI-nearest on a pod slice): its collectives are per-layer and
    activation-sized, the pipe hops are once per microbatch tick.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    pp = pipeline_parallel
    assert n % (model_parallel * pp) == 0, (n, model_parallel, pp)
    if pp > 1:
        arr = np.asarray(devices).reshape(
            n // (model_parallel * pp), pp, model_parallel
        )
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device_put each leaf with its batch axis sharded over 'data'.

    Leaves whose batch axis is not divisible by the data-axis size (the
    ragged LAST evaluation batch: val sets are rarely a multiple of
    devices*batch) are placed replicated instead — jitted steps accept any
    input sharding, so this trades a bit of redundant compute on the tail
    batch for never crashing mid-validation on a pod."""
    n_data = mesh.shape.get("data", 1)

    def put(x):
        if np.ndim(x) == 0 or np.shape(x)[0] % n_data != 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(put, batch)


def shard_batch_local(batch: Any, mesh: Mesh) -> Any:
    """Assemble a GLOBAL batch from per-process LOCAL slices.

    Multi-host input scaling: each host loads only its own part of the data
    (e.g. CC3M shards split by process, `data.split_shards_by_process`) and
    passes its local batch here; `jax.make_array_from_process_local_data`
    stitches the global array without any host ever materialising it — the
    reference gets the same division of labour from DistributedSampler /
    wds split_by_worker. The global batch axis is local_batch x
    process_count, so configure batch_size per host.

    Single-process this is exactly `shard_batch` (tested equal), so code can
    use it unconditionally. Local batch axes must divide the per-process
    data-axis extent; ragged tails should stay on the replicated
    `shard_batch` path (which every process can feed identically).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)

    def put(x):
        if np.ndim(x) == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, np.ndim(x)), np.asarray(x)
        )

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_device_count() -> int:
    return jax.local_device_count()


def is_main_process() -> bool:
    """True on the host that owns all file I/O (checkpoints, index, loggers).

    On a multi-host pod every process runs the same training loop; with the
    TrainState replicated, process 0's device_get copy is complete, so only
    it writes — concurrent writers to one save_dir corrupt index.json and the
    tfevents stream (the reference gets this from PL's rank_zero_only,
    ref trainer.py:974-1017 / rank_zero_info call sites).
    """
    return jax.process_index() == 0

"""Pipeline parallelism (GPipe) over the mesh's 'model' axis.

The reference scales only via DDP (`/root/reference/bcos/training/trainer.py:915-918`);
this is a TPU-native extension: S homogeneous stages (e.g. ViT encoder
blocks) are placed one-per-device along the 'model' axis, microbatches flow
stage-to-stage over ICI via `lax.ppermute`, and the whole schedule is ONE
jitted `lax.scan` — no host round-trips, and `jax.grad` differentiates
straight through it (ppermute's VJP is the reverse ring, the same property
the SigLIP ring loss relies on, losses.py).

Schedule: the standard SPMD GPipe loop. With M microbatches and S stages the
scan runs T = M + S - 1 ticks; at tick t stage 0 ingests microbatch min(t,
M-1) (duplicate feeds past M never reach an output slot) and stage S-1 writes
the output of microbatch t-(S-1). Every device executes the stage function
every tick, so the bubble fraction is the usual (S-1)/T — amortised away by
choosing M >> S.

Composes with data parallelism: microbatches keep their batch axis sharded
over 'data'; the ring rides only the 'model' axis.

Use::

    stacked = stack_stage_params([p0, p1, p2, p3])     # leading stage axis
    y = pipeline_apply(stage_fn, stacked, x, mesh, n_microbatches=8)

Validated on the 8-virtual-device CPU mesh (dp=2, pp=4): forward and
gradients identical to the sequential composition (tests/test_pp.py).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bcosification_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS

__all__ = ["stack_stage_params", "pipeline_apply", "pp_size"]


def stack_stage_params(stage_params: list) -> Any:
    """Stack S per-stage param trees into one tree with a leading stage axis.

    All stages must be homogeneous (same tree structure and leaf shapes) —
    true for ViT encoder blocks, the intended pipeline body.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage_params)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: Mesh,
    *,
    n_microbatches: int,
    axis: str | None = None,
    data_axis: str = DATA_AXIS,
) -> jax.Array:
    """Run ``stage_fn`` S times as a pipeline; equals sequential composition.

    - stacked_params: tree with leading stage axis of size S == mesh.shape[axis]
    - x: (B, ...) activations; B must divide into n_microbatches, and the
      microbatch size must stay divisible by the 'data' axis (batch stays
      data-sharded throughout).
    """
    if axis is None:  # ride 'pipe' on a 3-axis mesh, 'model' on the classic one
        axis = PIPE_AXIS if PIPE_AXIS in mesh.shape else MODEL_AXIS
    S = mesh.shape[axis]
    lead = {l.shape[0] for l in jax.tree_util.tree_leaves(stacked_params)}
    assert lead == {S}, (
        f"stacked_params leading axis {lead} must equal the '{axis}' axis size {S}"
    )
    B = x.shape[0]
    M = n_microbatches
    assert B % M == 0, (B, M)
    xm = x.reshape(M, B // M, *x.shape[1:])
    T = M + S - 1

    def per_device(params, xm_local):
        params = jax.tree_util.tree_map(lambda l: l[0], params)  # (1,...) -> (...)
        stage = jax.lax.axis_index(axis)
        zero = jnp.zeros_like(xm_local[0])

        def tick(carry, t):
            recv, outs = carry
            feed = jax.lax.dynamic_index_in_dim(
                xm_local, jnp.minimum(t, M - 1), keepdims=False
            )
            inp = jnp.where(stage == 0, feed, recv)
            # stage s holds real data only for ticks [s, s+M); outside that
            # window substitute the (well-conditioned) raw microbatch and zero
            # the output, so bubble computations can't poison the backward —
            # degenerate fillers (zeros/ones) hit 0/0 patch norms or var=0
            # LayerNorms whose VJP partials are inf, and 0-cotangent * inf
            # = NaN contaminates the whole param grad
            valid = (t >= stage) & (t < stage + M)
            out = stage_fn(params, jnp.where(valid, inp, feed))
            out = jnp.where(valid, out, jnp.zeros_like(out))
            # stage S-1's output at tick t is microbatch t-(S-1); write it
            # (clamped index; the mask voids pre-fill ticks)
            slot = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, slot, keepdims=False)
            write = jnp.where(t >= S - 1, out, prev)
            outs = jax.lax.dynamic_update_index_in_dim(outs, write, slot, 0)
            recv = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (recv, outs), None

        outs0 = jnp.zeros_like(xm_local)
        # the carry becomes device-varying over the ring after one tick;
        # mark the initial value so scan's carry type is stable
        zero, outs0 = jax.tree_util.tree_map(
            lambda t: jax.lax.pcast(t, (axis,), to="varying"), (zero, outs0)
        )
        (_, outs), _ = jax.lax.scan(tick, (zero, outs0), jnp.arange(T))
        # emit with a leading singleton stage axis; only stage S-1's slice is
        # meaningful — selected by the caller after the shard_map gather
        return outs[None]

    ndim_rest = xm.ndim - 2
    x_spec = P(None, data_axis, *([None] * ndim_rest))
    # On a 3-axis (data, pipe, model) mesh, only the pipe ring and the batch
    # axis are manual — every other axis (TP's 'model') stays automatic, so
    # GSPMD propagates the stage params' own shardings through stage_fn and
    # places the TP collectives inside each pipeline tick. On the classic
    # 2-axis mesh this set covers all axes (== the default all-manual).
    manual = frozenset(a for a in (axis, data_axis) if a in mesh.shape)
    out = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), x_spec),
        out_specs=P(axis, None, data_axis, *([None] * ndim_rest)),
        axis_names=manual,
    )(stacked_params, xm)
    y = out[S - 1]
    return y.reshape(B, *y.shape[2:])


def pp_size(mesh: Mesh) -> int:
    """Stage count: the 'pipe' axis on a 3-axis mesh, else 'model'."""
    return mesh.shape.get(PIPE_AXIS) or mesh.shape[MODEL_AXIS]

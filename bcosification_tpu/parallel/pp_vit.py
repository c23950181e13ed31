"""Pipeline-parallel SimpleViT — GPipe over the real model zoo.

The reference has no pipeline parallelism at all (DDP only,
`/root/reference/bcos/training/trainer.py:915-918`); `parallel/pp.py`
provides the TPU-native GPipe schedule for any homogeneous stage stack, and
this module applies it to the actual `models/vit.py::SimpleViT`: the encoder
blocks (the model's entire depth axis) are pipelined over the mesh while the
tiny stem and head stay replicated data-parallel work.

Layout contract: the model's canonical param tree is UNCHANGED — stage
stacking happens inside the jitted forward (a gather/stack XLA folds into the
shard_map prologue), so checkpoints, EMA, optimizers, explanations and every
existing test see the exact tree the unpipelined model produces. Trade-off:
with replicated state, GSPMD re-scatters the stacked stage params over the
'pipe'/'model' axis each step; for capacity-bound deployments pre-shard the
stacked tree and call `pp.pipeline_apply` directly (tests/test_pp.py shows
the persistent-layout form, including 3D PPxTPxDP).

`PipelinedViT` wraps a SimpleViT behind the same `.apply(variables, x,
train=..., explain=..., mutable=...)` surface the step builders use, so
`make_train_step` / `make_eval_step` / `make_explain_fn` work unchanged
(`trainer.pipeline_parallel: S` wires it up).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from bcosification_tpu.models.vit import Encoder, SimpleViT, _patchify, pos_emb_sincos_2d
from bcosification_tpu.parallel import pp as pp_lib
from bcosification_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS

__all__ = ["vit_pipeline_forward", "pick_microbatches", "PipelinedViT"]


def _pp_axis(mesh: Mesh) -> str:
    return PIPE_AXIS if PIPE_AXIS in mesh.shape else MODEL_AXIS


def pick_microbatches(batch: int, n_stages: int, n_data: int, target: Optional[int] = None) -> int:
    """Largest M <= target (default 4*S, the GPipe bubble guideline) with
    B % M == 0 and the microbatch divisible by the 'data' axis.

    Always solvable when n_data | batch (M = batch/n_data is in the search
    space); `vit_pipeline_forward` pads ragged batches up to that multiple
    first, so ragged validation tails never crash (the shard_batch contract,
    parallel/mesh.py)."""
    target = 4 * n_stages if target is None else target
    for m in range(min(target, batch), 0, -1):
        if batch % m == 0 and (batch // m) % n_data == 0:
            return m
    raise ValueError(
        f"no valid microbatch count for batch={batch}, data axis={n_data}"
    )


def _sub(module, variables, key, x, f):
    """Apply a stem/head submodule on its own param (+batch_stats) subtree."""
    sub = {"params": variables["params"].get(key, {})}
    bs = variables.get("batch_stats") or {}
    if key in bs:
        sub["batch_stats"] = bs[key]
    return module.apply(sub, x, **f)


def vit_pipeline_forward(
    vit: SimpleViT,
    variables: Any,
    x: jax.Array,
    mesh: Mesh,
    *,
    n_microbatches: Optional[int] = None,
    train: bool = False,
    explain: bool = False,
) -> jax.Array:
    """SimpleViT forward with the encoder stack pipelined over the mesh.

    Values equal `vit.apply(variables, x, ...)` (tests/test_pp_vit.py locks
    forward AND grads). Stages = the pipeline axis size; requires
    depth % stages == 0 (each stage scans depth/stages blocks).
    """
    f = dict(train=train, explain=explain)
    params = variables["params"]
    axis = _pp_axis(mesh)
    S = mesh.shape[axis]
    assert vit.depth % S == 0, (
        f"SimpleViT depth {vit.depth} must split evenly over {S} pipeline stages"
    )
    if train and (variables.get("batch_stats") or {}):
        raise NotImplementedError(
            "pipelined train with stateful norms (batch_stats) is not "
            "supported — SimpleViT's LayerNorm family is stateless"
        )

    # Ragged batches (the last validation batch): pad up to a multiple of the
    # 'data' axis by REPEATING real rows (never zeros/constants — B-cos patch
    # norms on degenerate rows have inf sqrt-VJP partials, parallel/pp.py),
    # run, slice back. Keeps shard_batch's never-crash-on-tails contract.
    n_data = mesh.shape.get(DATA_AXIS, 1)
    B0 = x.shape[0]
    pad = (-B0) % n_data
    if pad:  # modular indices: pad may exceed B0 (e.g. B0=3 on 8 data shards)
        x = jnp.concatenate([x, x[jnp.arange(pad) % B0]], axis=0)

    # --- stem (same math as SimpleViT.__call__, models/vit.py) -------------
    p1, p2 = (
        vit.patch_size
        if isinstance(vit.patch_size, tuple)
        else (vit.patch_size, vit.patch_size)
    )
    if vit.conv_stem:
        in_ch = x.shape[-1]
        for i, outc in enumerate(vit.conv_stem):
            conv = vit.conv2d_layer(
                outc, kernel_size=3, stride=(2 if outc > in_ch else 1), padding=1
            )
            x = _sub(conv, variables, f"conv_stem_{3 * i}", x, f)
            x = _sub(vit.norm2d_layer(outc), variables, f"conv_stem_{3 * i + 1}", x, f)
            x = _sub(vit.act_layer(), variables, f"conv_stem_{3 * i + 2}", x, f)
            in_ch = outc
    x = _patchify(x, p1, p2)
    x = _sub(vit.linear_layer(vit.dim), variables, "to_patch_embedding_linear", x, f)
    b, h, w, d = x.shape
    x = x.reshape(b, h * w, d)
    if vit.pos_embedding:
        x = x + pos_emb_sincos_2d(h, w, d, dtype=x.dtype)

    # --- pipelined encoder stack -------------------------------------------
    enc = Encoder(
        vit.heads,
        vit.dim // vit.heads,
        vit.mlp_dim,
        vit.linear_layer,
        vit.norm_layer,
        vit.act_layer,
        vit.qkv_layer,
        moe_experts=vit.moe_experts,
        moe_capacity_factor=vit.moe_capacity_factor,
    )
    blocks = [params[f"encoder_{i}"] for i in range(vit.depth)]
    stacked = pp_lib.stack_stage_params(blocks)  # (depth, ...)
    stacked = jax.tree_util.tree_map(
        lambda l: l.reshape(S, vit.depth // S, *l.shape[1:]), stacked
    )

    def stage_fn(p, hx):
        def body(c, pb):
            return enc.apply({"params": pb}, c, **f), None

        hx, _ = jax.lax.scan(body, hx, p)
        return hx

    # n_microbatches is a TARGET (clamped to what divides this batch) so an
    # explicit trainer.pp_microbatches never trips the strict low-level
    # asserts on a differently-sized tail batch
    M = pick_microbatches(x.shape[0], S, n_data, target=n_microbatches)
    x = pp_lib.pipeline_apply(stage_fn, stacked, x, mesh, n_microbatches=M, axis=axis)
    if pad:
        x = x[:B0]

    # --- head ----------------------------------------------------------------
    def head(t):
        t = _sub(vit.norm_layer(t.shape[-1]), variables, "linear_head_norm", t, f)
        return _sub(
            vit.linear_layer(vit.num_classes), variables, "linear_head_linear", t, f
        )

    x = head(x).mean(axis=1) if vit.gap_reorder else head(x.mean(axis=1))

    if vit.with_logit_layer:
        from bcosification_tpu.modules import LogitLayer

        bias = (
            -math.log(vit.num_classes - 1)
            if vit.logit_bias is None
            else vit.logit_bias
        )
        x = _sub(
            LogitLayer(vit.logit_temperature, bias), variables, "logit_layer", x, f
        )
    return x


class PipelinedViT:
    """SimpleViT wrapper exposing the step builders' `.apply` surface with the
    encoder stack pipelined — drop-in for `make_train_step`, `make_eval_step`
    and `make_explain_fn` (trainer config: ``trainer.pipeline_parallel: S``)."""

    def __init__(self, vit: SimpleViT, mesh: Mesh, n_microbatches: Optional[int] = None):
        self.vit = vit
        self.mesh = mesh
        self.n_microbatches = n_microbatches

    def apply(
        self,
        variables,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        mutable: Any = None,
        **kwargs,
    ):
        out = vit_pipeline_forward(
            self.vit,
            variables,
            x,
            self.mesh,
            n_microbatches=self.n_microbatches,
            train=train,
            explain=explain,
        )
        if mutable:
            return out, {}  # stateless (LayerNorm) — nothing mutated
        return out

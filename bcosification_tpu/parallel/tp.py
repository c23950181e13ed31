"""Tensor parallelism over the mesh's 'model' axis.

The reference scales only via DDP (`/root/reference/bcos/training/trainer.py:915-918`);
this module is a TPU-native extension: Megatron-style sharding rules for the
ViT/CLIP transformer blocks, expressed purely as `PartitionSpec`s. XLA/GSPMD
propagates them through the (unchanged) model code and inserts the collectives
— one psum per attention block and one per MLP block ride the ICI.

Rules (linears store ``weight`` as (in, out), see modules/bcos_layers.py):
- attention ``to_qkv``: column-parallel — out features (heads) sharded
- attention ``to_out``: row-parallel — in features sharded, psum after
- MLP ``linear1``: column-parallel (hidden sharded)
- MLP ``linear2``: row-parallel (hidden sharded, psum after)
- column-parallel per-output vectors (bias/scale) sharded; everything else
  (norms, patch embed, head, convs) replicated.

Use: ``specs = tp_param_specs(params)`` then ``shard_params(params, mesh,
specs)`` and jit with those shardings; activations stay batch-sharded over
'data'. Works for any model whose transformer blocks use the attn/ff module
names from models/vit.py and clip/model.py.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bcosification_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["tp_param_specs", "shard_params", "tp_size"]

# (module-name, param-name) -> sharded weight axis (0 = in/row, 1 = out/col)
# models/vit.py blocks nest linears under attn/ff modules (to_qkv, to_out,
# linear1, linear2); clip/model.py's ResidualAttentionBlock uses FLAT names
# (attn_in_proj, attn_out_proj, mlp_c_fc, mlp_c_proj — clip/model.py:283-308),
# so those appear as owners themselves (r5 review: the old exact-name
# in_block gate matched neither, silently replicating every CLIP weight)
_COLUMN_PARALLEL = (
    "to_qkv", "linear1", "c_fc", "attn_in_proj", "mlp_c_fc",
)  # out features sharded
_ROW_PARALLEL = (
    "to_out", "linear2", "c_proj", "attn_out_proj", "mlp_c_proj",
)  # in features sharded


def _path_keys(path):
    return [p.key if hasattr(p, "key") else str(p) for p in path]


def _spec_for(path, leaf) -> P:
    keys = _path_keys(path)
    name = keys[-1]
    owner = keys[-2] if len(keys) >= 2 else ""
    # only transformer-block linears; conv stems etc. stay replicated.
    # exact names cover the vit.py attn/ff module scopes; the prefixed
    # forms cover clip/model.py's flat in-block names (attnpool's c_proj
    # deliberately does NOT match: "attnpool" is neither).
    in_block = any(
        k in ("attn", "ff", "mlp", "attention")
        or k.startswith(("attn_", "mlp_"))
        for k in keys
    )
    if not in_block:
        return P()
    if owner in _COLUMN_PARALLEL:
        if name == "weight" and leaf.ndim == 2:
            return P(None, MODEL_AXIS)
        if name in ("bias", "scale") and leaf.ndim == 1:
            return P(MODEL_AXIS)
    if owner in _ROW_PARALLEL:
        if name == "weight" and leaf.ndim == 2:
            return P(MODEL_AXIS, None)
        # row-parallel bias/scale apply after the psum -> replicated
    return P()


def tp_param_specs(params) -> Any:
    """PartitionSpec pytree matching ``params`` with Megatron TP rules."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(params, mesh: Mesh, specs: Optional[Any] = None) -> Any:
    """device_put each param with its TP spec (replicated where P())."""
    specs = tp_param_specs(params) if specs is None else specs
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def tp_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]

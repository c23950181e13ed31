"""Scale-out demo on a virtual 8-device mesh (no TPU pod needed).

Shows the three config-key parallelisms of docs/SCALING.md on one host:
replicated DP (the reference's DDP regime), FSDP/ZeRO-3, and TP — all with
the SAME jitted train step, producing the same loss.

    python examples/scaling_demo.py
"""
import os
import sys
from pathlib import Path

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from bcosification_tpu.losses import UniformOffLabelsBCEWithLogitsLoss  # noqa: E402
from bcosification_tpu.models import vit as vit_lib  # noqa: E402
from bcosification_tpu.parallel import fsdp, mesh as mesh_lib, tp  # noqa: E402
from bcosification_tpu.training import steps  # noqa: E402


def main():
    model = vit_lib.SimpleViT(
        image_size=32, patch_size=8, num_classes=10, dim=64, depth=2, heads=4,
        mlp_dim=128,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((16, 32, 32, 6)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 10, 16).astype(np.int32)),
    }
    x0 = batch["image"][:1]
    variables = model.init(jax.random.PRNGKey(0), x0)

    tx = optax.adam(1e-3)
    train_step = steps.make_train_step(
        model, UniformOffLabelsBCEWithLogitsLoss(), tx
    )

    def one_step(mesh, placed):
        _, metrics = train_step(placed, mesh_lib.shard_batch(batch, mesh))
        return float(metrics["loss"])

    # 1. replicated DP over 8 devices (the reference's DDP equivalent)
    mesh = mesh_lib.make_mesh(8)
    state = steps.create_train_state(variables, tx)
    print("DP  loss:", one_step(mesh, mesh_lib.replicate(state, mesh)))

    # 2. FSDP/ZeRO-3: params + moments sharded over 'data'
    state = steps.create_train_state(variables, tx)
    specs = fsdp.fsdp_state_specs(state, mesh, min_size=1024)
    print("FSDP loss:", one_step(mesh, fsdp.shard_state(state, mesh, specs)))

    # 3. TP (dp=2 x mp=4): attn/MLP weights sharded Megatron-style
    tp_mesh = mesh_lib.make_mesh(model_parallel=4)
    state = steps.create_train_state(variables, tx)
    specs = tp.tp_param_specs(state)
    print("TP  loss:", one_step(tp_mesh, fsdp.shard_state(state, tp_mesh, specs)))

    # 4. PP (dp=4 x pipe=2): the encoder stack as a GPipe pipeline — same
    # step builder, the model is just wrapped (trainer.pipeline_parallel)
    from bcosification_tpu.parallel.pp_vit import PipelinedViT

    pp_mesh = mesh_lib.make_mesh(pipeline_parallel=2)
    pp_step = steps.make_train_step(
        PipelinedViT(model, pp_mesh), UniformOffLabelsBCEWithLogitsLoss(), tx
    )
    state = steps.create_train_state(variables, tx)
    _, metrics = pp_step(
        mesh_lib.replicate(state, pp_mesh), mesh_lib.shard_batch(batch, pp_mesh)
    )
    print("PP  loss:", float(metrics["loss"]))

    print("identical losses == same math, different layouts; in training "
          "runs these are the config keys trainer.fsdp / "
          "trainer.model_parallel / trainer.pipeline_parallel")


if __name__ == "__main__":
    main()

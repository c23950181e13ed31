"""Worker for tests/test_real_distributed.py — a REAL 2-process
`jax.distributed` run on CPU (Gloo), driving the actual pod launcher
(`run_distributed.initialize_distributed`, MASTER_ADDR env contract) and the
real `Trainer.fit` with `data.split_by_process` multi-host input scaling.

Everything the single-process tests monkeypatch is real here: process_count,
`jax.make_array_from_process_local_data` stitching, the `_host_state`
all-gather before checkpointing, process-0-only writes, and restore on every
process from the shared save_dir.

Usage (spawned twice by the test): real_distributed_worker.py <save_dir>
with MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK set per process.
"""
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from bcosification_tpu.data.datamodules import ClassificationDataModule


class RealDistDataModule(ClassificationDataModule):
    NUM_CLASSES = 4

    def __init__(self, config):
        super().__init__(config)
        rng = np.random.default_rng(7)
        self.images = rng.normal(size=(64, 8, 8, 6)).astype(np.float32) * 0.1
        self.labels = (np.arange(64) % 4).astype(np.int64)
        for i, l in enumerate(self.labels):
            self.images[i, ..., l] += 0.8

    def setup(self, stage=None):
        self.train_dataset = [
            (self.images[i], int(self.labels[i])) for i in range(64)
        ]
        self.eval_dataset = self.train_dataset[:16]


def main():
    import run_distributed

    multi = run_distributed.initialize_distributed(argv=["prog"])
    assert multi is True, "expected a live 2-process group"
    assert jax.process_count() == 2, jax.process_count()
    rank = jax.process_index()

    import jax.numpy as jnp

    from test_trainer_e2e import TinyNet, _fake_experiment
    from bcosification_tpu.training.trainer import Trainer

    save_dir = Path(sys.argv[1])
    exp = _fake_experiment(save_dir)
    exp.config["data"] = dict(split_by_process=True)
    dm = RealDistDataModule(dict(
        batch_size=8, num_workers=0, split_by_process=True,
        train_transform=None, test_transform=None,
    ))
    model = TinyNet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )

    # 2 epochs: each host samples 32 of the 64 images (disjoint halves),
    # 4 steps/epoch of global batch 16 stitched from two local-8 slices
    trainer = Trainer(exp)
    state = trainer.fit(model, variables, dm, max_epochs=2)
    steps = int(jax.device_get(state.step))
    print(f"WORKER {rank} FIT steps={steps} "
          f"hash={Trainer.param_hash(state.params)}", flush=True)

    # resume from the shared checkpoint dir: every process restores, one
    # more epoch trains on top
    trainer2 = Trainer(exp)
    state2 = trainer2.fit(model, variables, dm, max_epochs=3)
    print(f"WORKER {rank} RESUME steps={int(jax.device_get(state2.step))} "
          f"hash={Trainer.param_hash(state2.params)}", flush=True)

    # FSDP: params/opt-state sharded ACROSS the two real processes — the
    # checkpoint path must all-gather them (Trainer._host_state's jitted
    # replicate, a collective every process joins) before the rank-0 write;
    # param_hash goes through the same gather (sharded leaves span
    # non-addressable devices)
    exp3 = _fake_experiment(save_dir / "fsdp")
    exp3.config["data"] = dict(split_by_process=True)
    exp3.config["trainer"].update(fsdp=True, fsdp_min_size=1)
    trainer3 = Trainer(exp3)
    state3 = trainer3.fit(model, variables, dm, max_epochs=1)
    h3 = Trainer.param_hash(trainer3._host_state(state3.params))
    print(f"WORKER {rank} FSDP steps={int(jax.device_get(state3.step))} "
          f"hash={h3}", flush=True)

    trainer4 = Trainer(exp3)
    state4 = trainer4.fit(model, variables, dm, max_epochs=2)
    h4 = Trainer.param_hash(trainer4._host_state(state4.params))
    print(f"WORKER {rank} FSDPRESUME steps={int(jax.device_get(state4.step))} "
          f"hash={h4}", flush=True)

    # SigLIP ppermute ring across the REAL process boundary (Gloo): ring
    # loss + ring-VJP gradients on the 4-device/2-process mesh must equal
    # the full-matrix oracle (the single-process version of this check is
    # tests/test_losses.py::test_siglip_ring_multidevice)
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bcosification_tpu import losses as L

    n_dev = jax.device_count()
    ring_mesh = Mesh(np.array(jax.devices()), ("data",))
    local_b, d = 4, 16
    grng = np.random.default_rng(11)
    img = grng.standard_normal((local_b * n_dev, d)).astype(np.float32)
    txt = grng.standard_normal((local_b * n_dev, d)).astype(np.float32)
    scale, bias = np.float32(10.0), np.float32(-10.0)
    sh = NamedSharding(ring_mesh, P("data"))
    n_local = img.shape[0] // jax.process_count()
    lo = rank * n_local
    g_img = jax.make_array_from_process_local_data(sh, img[lo:lo + n_local])
    g_txt = jax.make_array_from_process_local_data(sh, txt[lo:lo + n_local])

    loss_fn = L.SigLipLoss(bidir=True, axis_name="data")

    @jax.jit
    def ring_metrics(i, t):
        def shard_loss(ii, tt):
            return jax.lax.psum(loss_fn(ii, tt, scale, bias), "data")

        total = shard_map(
            shard_loss, mesh=ring_mesh,
            in_specs=(P("data"), P("data")), out_specs=P(),
        )
        val, (gi, gt) = jax.value_and_grad(
            lambda a, b: total(a, b), argnums=(0, 1)
        )(i, t)
        return val, (gi ** 2).sum() + (gt ** 2).sum()

    val, gnorm = map(float, ring_metrics(g_img, g_txt))

    def oracle(i, t):
        logits = scale * i @ t.T + bias
        b = i.shape[0]
        labels = -jnp.ones((b, b)) + 2 * jnp.eye(b)
        return -jnp.sum(jax.nn.log_sigmoid(labels * logits)) / local_b

    want = float(oracle(jnp.asarray(img), jnp.asarray(txt)))
    goi, got_ = jax.grad(oracle, argnums=(0, 1))(
        jnp.asarray(img), jnp.asarray(txt)
    )
    gnorm_want = float((goi ** 2).sum() + (got_ ** 2).sum())
    assert abs(val - want) <= 1e-4 * abs(want), (val, want)
    assert abs(gnorm - gnorm_want) <= 1e-4 * abs(gnorm_want), (gnorm, gnorm_want)
    print(f"WORKER {rank} RING loss={val:.6f} gnorm={gnorm:.6f}", flush=True)


if __name__ == "__main__":
    main()

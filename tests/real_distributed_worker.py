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


if __name__ == "__main__":
    main()

"""Multi-host I/O guards: only process 0 writes checkpoints/index/loggers,
and the pod launcher fails loudly when distributed init fails."""
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_non_main_process_save_is_noop(tmp_path, monkeypatch):
    """A 'process 1' writer must not touch index.json or the orbax tree even
    when interleaved with process 0 saves — the index stays valid JSON with
    exactly process 0's entries."""
    from bcosification_tpu.training.checkpointing import CheckpointManager

    state = {"w": jnp.ones((3,)), "step": jnp.zeros((), jnp.int32)}
    m0 = CheckpointManager(str(tmp_path), monitor="val_acc1")
    m1 = CheckpointManager(str(tmp_path), monitor="val_acc1")

    m0.save(state, 0, {"val_acc1": 0.1})
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    m1.save({"w": jnp.full((3,), 9.0), "step": jnp.ones((), jnp.int32)}, 0,
            {"val_acc1": 0.9})  # must be a no-op
    m1.save(state, 5, {"val_acc1": 0.5})  # and this
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    m0.save(state, 1, {"val_acc1": 0.2})

    index = json.loads((tmp_path / "checkpoints" / "index.json").read_text())
    assert sorted(index["epochs"]) == ["0", "1"]
    assert index["last"] == 1
    assert index["epochs"]["0"]["metrics"]["val_acc1"] == pytest.approx(0.1)
    assert not (tmp_path / "checkpoints" / "epoch_5").exists()

    restored, ep = m0.restore(state, "last")
    assert ep == 1
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(3))


def test_trainer_non_main_process_writes_nothing(tmp_path, monkeypatch):
    from test_trainer_e2e import SynthDataModule, TinyNet, _fake_experiment
    from bcosification_tpu.training.trainer import Trainer

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    exp = _fake_experiment(tmp_path)
    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True)
    trainer = Trainer(exp)
    assert trainer.loggers == []
    trainer.fit(model, variables, dm, max_epochs=1)
    assert not (exp.save_dir / "metrics.csv").exists()
    assert not (exp.save_dir / "checkpoints" / "index.json").exists()


def test_run_distributed_fails_loudly():
    import run_distributed

    def boom():
        raise ConnectionError("no coordinator")

    with pytest.raises(RuntimeError, match="single-host-ok"):
        run_distributed.initialize_distributed(argv=["prog"], _initialize=boom)

    # explicit escape hatch: falls back and consumes the flag
    argv = ["prog", "--single-host-ok", "--dataset", "ImageNet"]
    assert run_distributed.initialize_distributed(argv=argv, _initialize=boom) is False
    assert "--single-host-ok" not in argv

    # successful single-process init reports multi-host=False
    assert run_distributed.initialize_distributed(
        argv=["prog"], _initialize=lambda: None
    ) is False


def test_shard_batch_local_single_process_equals_shard_batch(rng):
    """shard_batch_local is the drop-in multi-host input-scaling entry: at
    process_count 1 it must place batches exactly like shard_batch."""
    import numpy as np

    import jax.numpy as jnp

    from bcosification_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    batch = {
        "image": jnp.asarray(rng.random((16, 4, 4, 3)).astype(np.float32)),
        "label": jnp.arange(16, dtype=jnp.int32),
        "scale": jnp.float32(2.0),
    }
    a = mesh_lib.shard_batch(batch, mesh)
    b = mesh_lib.shard_batch_local(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding, k


def test_cc3m_split_shards_by_process(tmp_path, monkeypatch):
    """data.split_shards_by_process partitions the TRAIN shard list across
    processes (disjoint cover, wds split_by_worker semantics); validation
    stays replicated; too few shards fail loudly."""
    import jax

    from bcosification_tpu.data.cc3m import CC3MDataModule

    # a fake shard tree: 8 training tars + the 2 validation tars
    (tmp_path / "training").mkdir()
    (tmp_path / "validation").mkdir()
    for i in range(8):
        (tmp_path / "training" / f"{i:05d}.tar").touch()
    for i in range(2):
        (tmp_path / "validation" / f"{i:05d}.tar").touch()

    class SplitTestDataModule(CC3MDataModule):
        TRAIN_SHARDS = "training/{00000..00007}.tar"
        VAL_SHARDS = "validation/{00000..00001}.tar"

    cfg = dict(
        data_root=str(tmp_path), batch_size=2, num_workers=0,
        split_shards_by_process=True,
        train_transform=None, test_transform=None,
    )
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    seen = []
    for pi in range(4):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        dm = SplitTestDataModule(cfg)
        dm.setup("fit")
        seen.append(list(dm.train_dataset.shards))
        assert len(dm.eval_dataset.shards) == 2  # val replicated
    flat = [s for part in seen for s in part]
    assert len(flat) == 8 and len(set(flat)) == 8  # disjoint cover
    # off: every process sees every shard
    dm_all = SplitTestDataModule(dict(cfg, split_shards_by_process=False))
    dm_all.setup("fit")
    assert len(dm_all.train_dataset.shards) == 8

    # fewer shards than processes is a loud error, not silent starvation
    monkeypatch.setattr(jax, "process_count", lambda: 16)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    dm_bad = SplitTestDataModule(cfg)
    try:
        dm_bad.setup("fit")
        assert False, "expected AssertionError"
    except AssertionError as e:
        assert "shards" in str(e)


def test_imagenet_sampler_split_by_process(monkeypatch):
    """data.split_by_process gives each host a disjoint 1/process_count of
    the supervised train set (rank-strided, repetitions=1); off -> no
    sampler (every host identical)."""
    import jax

    from bcosification_tpu.data.datamodules import ClassificationDataModule

    class SamplerTestDataModule(ClassificationDataModule):
        NUM_CLASSES = 4

        def setup(self, stage=None):
            self.train_dataset = list(range(103))  # non-multiple of world

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    seen = []
    for pi in range(4):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        dm = SamplerTestDataModule(dict(
            batch_size=2, num_workers=0, split_by_process=True,
            train_transform=None, test_transform=None,
        ))
        dm.setup()
        sampler = dm.get_train_sampler(seed=0)
        assert sampler is not None and sampler.rank == pi
        seen.append(list(iter(sampler)))
    # same-seed shuffles partition the (padded) index space disjointly
    flat = [i for part in seen for i in part]
    assert len(set(flat)) >= 100  # covers (nearly) the whole dataset
    lens = {len(p) for p in seen}
    assert len(lens) == 1  # equal per-host share
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (set(seen[a]) & set(seen[b])) or len(flat) > len(set(flat))

    dm_off = SamplerTestDataModule(dict(
        batch_size=2, num_workers=0,
        train_transform=None, test_transform=None,
    ))
    dm_off.setup()
    assert dm_off.get_train_sampler(seed=0) is None

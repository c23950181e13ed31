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

from bcosification_tpu.data.cc3m import CC3MDataModule  # noqa: E402
from bcosification_tpu.data.datamodules import ClassificationDataModule  # noqa: E402


# module scope: ClassificationDataModule.__init_subclass__ registers the name
# globally and raises on duplicates — defining these inside a test body would
# error on any re-execution (retry/parametrize) and pollute registry()
class SplitTestDataModule(CC3MDataModule):
    TRAIN_SHARDS = "training/{00000..00007}.tar"
    VAL_SHARDS = "validation/{00000..00001}.tar"


class SamplerTestDataModule(ClassificationDataModule):
    NUM_CLASSES = 4

    def setup(self, stage=None):
        self.train_dataset = list(range(103))  # non-multiple of world


def test_non_main_process_save_is_noop(tmp_path, monkeypatch):
    """A 'process 1' writer must not touch index.json or the orbax tree even
    when interleaved with process 0 saves — the index stays valid JSON with
    exactly process 0's entries. (The checkpointer is PROCESS-LOCAL so this
    guard involves no orbax cross-process barrier; the real multi-process
    path is driven by tests/test_real_distributed.py.)"""
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
    assert m0.resolve("best") == 1

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

    # a fake shard tree: 8 training tars + the 2 validation tars
    (tmp_path / "training").mkdir()
    (tmp_path / "validation").mkdir()
    for i in range(8):
        (tmp_path / "training" / f"{i:05d}.tar").touch()
    for i in range(2):
        (tmp_path / "validation" / f"{i:05d}.tar").touch()

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
    # same-seed shuffles partition the (padded) index space disjointly:
    # total_size = ceil(103/4)*4 = 104, so exactly ONE padding duplicate —
    # any rank overlap (e.g. an off-by-one in the stride) adds more
    flat = [i for part in seen for i in part]
    assert set(flat) == set(range(103))  # full cover
    assert len(flat) == 104
    assert len(flat) - len(set(flat)) == 1  # only the padding duplicate
    assert len({len(p) for p in seen}) == 1  # equal per-host share

    dm_off = SamplerTestDataModule(dict(
        batch_size=2, num_workers=0,
        train_transform=None, test_transform=None,
    ))
    dm_off.setup()
    assert dm_off.get_train_sampler(seed=0) is None


def test_ra_sampler_explicit_repetitions_keeps_reference_truncation():
    """Explicit ra_repetitions (even 1) keeps the reference's
    floor(len//256*256/num_replicas) selection (RASampler parity,
    /root/reference/bcos/data/sampler.py applies it for ALL repetitions);
    only the implicit split_by_process path (select_all) takes every
    sample."""
    from bcosification_tpu.data.sampler import RASampler

    ds = list(range(600))
    assert len(RASampler(ds, repetitions=1)) == 512
    assert len(RASampler(ds, repetitions=3)) == 512
    assert len(RASampler(ds, num_replicas=4, repetitions=1)) == 128
    s = RASampler(ds, num_replicas=4, repetitions=1, select_all=True)
    assert len(s) == 150  # ceil(600/4): every sample exactly once

    # the datamodule keys select_all on ra_repetitions being ABSENT: an
    # explicit ra_repetitions: 1 config must NOT change its steps/epoch
    # when a pod sets split_by_process (LR-schedule parity)
    dm = SamplerTestDataModule(dict(
        batch_size=2, num_workers=0, ra_repetitions=1,
        train_transform=None, test_transform=None,
    ))
    dm.setup()
    sampler = dm.get_train_sampler(seed=0)
    assert sampler is not None
    assert len(sampler) == 0  # reference: floor(103//256*256) = 0


def test_split_by_process_rejects_p_gridified(tmp_path):
    """SplitAndGrid yields variable-size batches that cannot be stitched
    from per-process local slices — the trainer must refuse the combination
    loudly instead of crashing (or silently replicating divergent hosts)."""
    from test_trainer_e2e import SynthDataModule, TinyNet, _fake_experiment

    from bcosification_tpu.training.trainer import Trainer

    exp = _fake_experiment(tmp_path)
    exp.config["data"] = dict(split_by_process=True, p_gridified=0.5)
    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )
    with pytest.raises(ValueError, match="p_gridified"):
        Trainer(exp).fit(model, variables, dm, max_epochs=1)


def test_native_loader_split_by_process(monkeypatch):
    """With data.split_by_process, the native C++ loader path must feed each
    host a disjoint, equal-length (lockstep) share of the train samples —
    not the full dataset (which shard_batch_local would silently stitch into
    a world-times-duplicated global batch). Eval stays full/replicated."""
    import jax

    from bcosification_tpu.data import native_loader as nl
    from bcosification_tpu.data.datamodules import ImageNetDataModule

    calls = []

    class FakeLoader:
        def __init__(self, paths, labels, **kw):
            calls.append((list(paths), list(labels)))

    monkeypatch.setattr(nl, "native_available", lambda: True)
    monkeypatch.setattr(nl, "NativeImageLoader", FakeLoader)
    monkeypatch.setattr(jax, "process_count", lambda: 4)

    ds = types.SimpleNamespace(
        samples=[(f"img_{i}.jpg", i % 4) for i in range(103)]
    )
    cfg = dict(
        batch_size=2, num_workers=0, native_loader=True,
        split_by_process=True, train_transform=None, test_transform=None,
    )
    seen = []
    for pi in range(4):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        dm = ImageNetDataModule(cfg)
        dm.train_dataset = ds
        loader = dm.train_dataloader(seed=0)
        assert isinstance(loader, FakeLoader)
        paths, _ = calls[-1]
        assert len(paths) == 103 // 4  # truncated to the common share
        seen.append(paths)
    flat = [p for part in seen for p in part]
    assert len(set(flat)) == len(flat)  # disjoint across hosts

    # eval is untouched: full dataset on every host (replicated shard_batch)
    dm.eval_dataset = ds
    assert isinstance(dm.val_dataloader(), FakeLoader)
    assert len(calls[-1][0]) == 103

    # off: train gets the full dataset too
    dm_off = ImageNetDataModule(dict(cfg, split_by_process=False))
    dm_off.train_dataset = ds
    dm_off.train_dataloader(seed=0)
    assert len(calls[-1][0]) == 103


def test_python_loader_augmentation_deterministic(tmp_path, rng):
    """The python DataLoader installs a per-sample transform rng keyed by
    (seed, epoch, epoch-position): batches are bit-identical across
    instances and THREAD COUNTS (multi-host replicated loading requires
    equal host batches — device_put asserts it), and vary with seed/epoch."""
    from PIL import Image

    from bcosification_tpu.data import transforms as T
    from bcosification_tpu.data.loader import DataLoader

    paths = []
    for i in range(12):
        p = tmp_path / f"i{i}.jpg"
        Image.fromarray(
            (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        ).save(p)
        paths.append(p)

    class DS:
        tf = T.Compose([
            T.RandomResizedCrop(16), T.RandomHorizontalFlip(),
            T.ToFloatArray(), T.AddInverse(),
        ])

        def __len__(self):
            return 12

        def __getitem__(self, i):
            return self.tf(Image.open(paths[i])), i % 3

    def grab(seed, workers, epoch=0):
        ld = DataLoader(DS(), 4, shuffle=True, num_workers=workers,
                        seed=seed, drop_last=True)
        ld.set_epoch(epoch)
        return [np.stack(b[0]) if isinstance(b, tuple) else b for b in ld]

    def imgs(batches):
        return [np.asarray(b[0] if isinstance(b, (tuple, list)) else b)
                for b in batches]

    a = imgs(grab(3, workers=1))
    b = imgs(grab(3, workers=4))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = imgs(grab(4, workers=4))
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))
    d = imgs(grab(3, workers=4, epoch=1))
    assert any(not np.array_equal(x, y) for x, y in zip(a, d))

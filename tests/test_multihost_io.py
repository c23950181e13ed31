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

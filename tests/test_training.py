"""End-to-end training-stack tests on synthetic data: optimizer/schedule
factories, AGC, EMA, train/eval steps, checkpointing + resume."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from bcosification_tpu.losses import UniformOffLabelsBCEWithLogitsLoss
from bcosification_tpu.optim import LRSchedulerFactory, OptimizerFactory
from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.training import steps as steps_lib
from bcosification_tpu.training.agc import adaptive_clip_grads, unitwise_norm
from bcosification_tpu.training.checkpointing import CheckpointManager
from bcosification_tpu.training.ema import adjusted_ema_decay, ema_update

from reference_loader import load_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _tiny_model(num_classes=5):
    from flax import linen as nn

    from bcosification_tpu.modules import BcosConv2d, norms

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            x = BcosConv2d(features=8, kernel_size=3, padding=1)(
                x, train=train, explain=explain
            )
            x = norms.NoBias(norms.BatchNormUncentered2d)(features=8)(
                x, train=train, explain=explain
            )
            x = BcosConv2d(features=num_classes, kernel_size=1)(
                x, train=train, explain=explain
            )
            return x.mean(axis=(1, 2))

    return Tiny()


@pytest.fixture
def tiny_setup(rng):
    model = _tiny_model()
    x = jnp.asarray(rng.random((4, 8, 8, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    return model, variables, x


def test_train_step_reduces_loss(tiny_setup, rng):
    model, variables, x = tiny_setup
    tx = OptimizerFactory(name="Adam", lr=1e-2).create(1e-2)
    step = steps_lib.make_train_step(
        model, UniformOffLabelsBCEWithLogitsLoss(), tx, use_agc=True,
        ema_decay=0.9, ema_steps=1, donate=False,
    )
    state = steps_lib.create_train_state(variables, tx, with_ema=True)
    batch = {"image": x, "label": jnp.asarray(rng.integers(0, 5, 4))}
    losses = []
    for _ in range(20):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 20
    # EMA params differ from raw params but are finite
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state.ema_params
    )
    assert all(np.isfinite(v) for v in jax.tree_util.tree_leaves(diff))


def test_train_step_multidevice(tiny_setup, rng):
    model, variables, x = tiny_setup
    mesh = mesh_lib.make_mesh(4)
    tx = optax.sgd(1e-2)
    step = steps_lib.make_train_step(
        model, UniformOffLabelsBCEWithLogitsLoss(), tx, donate=False
    )
    state = steps_lib.create_train_state(variables, tx)
    state_r = mesh_lib.replicate(state, mesh)
    batch = {
        "image": jnp.asarray(rng.random((8, 8, 8, 6)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 5, 8)),
    }
    batch_s = mesh_lib.shard_batch(batch, mesh)
    state1, m1 = step(state_r, batch_s)
    # single-device result must match the sharded result (DP == pjit psum)
    state2, m2 = step(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(jax.device_get(state1.params))
    l2 = jax.tree_util.tree_leaves(jax.device_get(state2.params))
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@needs_reference
def test_agc_vs_torch(rng):
    import torch

    ref = load_reference("bcos.training.agc")
    # conv weight: torch OIHW <-> ours HWIO
    w_oihw = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    g_oihw = rng.standard_normal((8, 4, 3, 3)).astype(np.float32) * 10
    p = torch.nn.Parameter(torch.from_numpy(w_oihw))
    p.grad = torch.from_numpy(g_oihw.copy())
    ref.adaptive_clip_grad_([p])
    want = p.grad.numpy()

    w_hwio = jnp.asarray(w_oihw.transpose(2, 3, 1, 0))
    g_hwio = jnp.asarray(g_oihw.transpose(2, 3, 1, 0))
    got = adaptive_clip_grads(w_hwio, g_hwio)
    np.testing.assert_allclose(
        np.asarray(got).transpose(3, 2, 0, 1), want, rtol=1e-5, atol=1e-6
    )


def test_lr_schedules_match_torch_semantics():
    import math

    spe = 10
    # cosine with linear warmup, epoch interval
    f = LRSchedulerFactory(
        name="cosineannealinglr", epochs=10, warmup_epochs=2, warmup_method="linear",
        warmup_decay=0.01,
    ).create(1.0, spe)
    assert abs(float(f(0)) - 0.01) < 1e-6  # start factor
    # after warmup: t=0 of cosine -> lr = 1.0
    assert abs(float(f(2 * spe)) - 1.0) < 1e-6
    # end of training: cos(pi) -> 0
    assert float(f(10 * spe)) < 1e-6

    g = LRSchedulerFactory(name="steplr", step_size=3, gamma=0.1).create(1.0, spe)
    assert abs(float(g(0)) - 1.0) < 1e-9
    assert abs(float(g(3 * spe)) - 0.1) < 1e-9
    assert abs(float(g(6 * spe)) - 0.01) < 1e-9


def test_checkpoint_manager_roundtrip(tmp_path, tiny_setup):
    model, variables, x = tiny_setup
    tx = optax.adam(1e-3)
    state = steps_lib.create_train_state(variables, tx, with_ema=True)
    mgr = CheckpointManager(str(tmp_path), monitor="val_acc1", top_k=2)
    for epoch, acc in enumerate([0.1, 0.5, 0.3, 0.7, 0.2]):
        state = state.replace(step=state.step + 1)
        mgr.save(jax.device_get(state), epoch, {"val_acc1": acc})
    # pruning: keep last (4) + top2 (3:0.7, 1:0.5)
    assert set(mgr.available_checkpoints()) == {1, 3, 4}
    assert mgr.resolve("best") == 3
    assert mgr.resolve("last") == 4
    restored, epoch = mgr.restore(state, "best")
    assert epoch == 3 and int(restored.step) == 4
    l1 = jax.tree_util.tree_leaves(restored.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in l1)

    # crash-consistency invariants (r5 review): the index write is atomic
    # (no orphaned temp files), and every indexed epoch's directory exists —
    # _prune persists the index BEFORE rmtree so a crash can only leave
    # dangling DIRECTORIES, never dangling index entries
    import json as _json
    from pathlib import Path as _Path

    ckpt_dir = _Path(str(tmp_path)) / "checkpoints"
    assert not list(ckpt_dir.rglob("*.tmp"))
    index = _json.loads((ckpt_dir / "index.json").read_text())
    for ep in index["epochs"]:
        assert (ckpt_dir / f"epoch_{ep}").exists(), ep


def test_agc_and_clip_val_conflict_raises(tiny_setup):
    model, variables, x = tiny_setup
    tx = optax.adam(1e-3)
    with pytest.raises(ValueError, match="mutually exclusive"):
        steps_lib.make_train_step(
            model, lambda out, y: out.sum(), tx,
            use_agc=True, gradient_clip_val=1.0,
        )


def test_b_schedule_overwrites_b(rng):
    from bcosification_tpu.modules import BcosifyConv2d

    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            x = BcosifyConv2d(features=4, kernel_size=3, padding=1, learnable_b=True, b=1.0)(
                x, train=train, explain=explain
            )
            return x.mean(axis=(1, 2))

    model = M()
    x = jnp.asarray(rng.random((2, 8, 8, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    p2 = steps_lib.set_b_params(variables["params"], 1.7)
    flat = jax.tree_util.tree_flatten_with_path(p2)[0]
    bs = [v for path, v in flat if path[-1].key == "b"]
    assert len(bs) == 1 and float(bs[0]) == pytest.approx(1.7)


def test_adjusted_ema_decay_formula():
    # trainer.py:552-561
    d = adjusted_ema_decay(0.99, world_size=4, batch_size=64, max_epochs=90, ema_steps=32)
    adjust = 4 * 64 * 32 * 1 / 90
    assert d == pytest.approx(1.0 - min(1.0, (1 - 0.99) * adjust))


def test_grad_accumulation_matches_big_batch(rng):
    """trainer.accumulate_grad_batches=k: k micro-steps at batch B must produce
    the SAME update as one step at batch kB (optax.MultiSteps averages grads;
    the LR schedule advances once per k). Ref: PL accumulate_grad_batches
    consumed at trainer.py:554 / training.py:73-80."""
    import types

    from bcosification_tpu.losses import UniformOffLabelsBCEWithLogitsLoss
    from bcosification_tpu.optim.optimizer_factory import OptimizerFactory
    from bcosification_tpu.optim.lr_scheduler_factory import LRSchedulerFactory
    from bcosification_tpu.training.trainer import _make_optimizers
    from bcosification_tpu.training import steps as steps_lib
    from flax import linen as nn

    class Dense(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            return nn.Dense(5)(x.reshape((x.shape[0], -1)))

    model = Dense()
    x = rng.standard_normal((8, 4)).astype(np.float32)
    y = (rng.integers(0, 5, (8,))).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    crit = UniformOffLabelsBCEWithLogitsLoss()

    def make_exp(accum):
        exp = types.SimpleNamespace()
        exp.config = dict(
            criterion=crit,
            optimizer=OptimizerFactory(name="sgd", lr=0.5, momentum=0.9),
            lr_scheduler=LRSchedulerFactory(name="cosineannealinglr", epochs=2),
            trainer=dict(accumulate_grad_batches=accum),
            model=dict(),
        )
        return exp

    # accumulated: 2 micro-steps of batch 4
    tx_a, _, _ = _make_optimizers(make_exp(2), variables["params"], steps_per_epoch=2)
    step_a = steps_lib.make_train_step(model, crit, tx_a, donate=False)
    st_a = steps_lib.create_train_state(variables, tx_a)
    p0 = jax.device_get(st_a.params)
    st_a, _ = step_a(st_a, {"image": jnp.asarray(x[:4]), "label": jnp.asarray(y[:4])})
    # params must be UNCHANGED after the first micro-step
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(st_a.params), p0,
    )
    st_a, _ = step_a(st_a, {"image": jnp.asarray(x[4:]), "label": jnp.asarray(y[4:])})

    # one big step of batch 8
    tx_b, _, _ = _make_optimizers(make_exp(1), variables["params"], steps_per_epoch=1)
    step_b = steps_lib.make_train_step(model, crit, tx_b, donate=False)
    st_b = steps_lib.create_train_state(variables, tx_b)
    st_b, _ = step_b(st_b, {"image": jnp.asarray(x), "label": jnp.asarray(y)})

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        jax.device_get(st_a.params), jax.device_get(st_b.params),
    )


def test_shard_batch_ragged_last_batch():
    """A validation batch not divisible by the data-axis size (the last
    batch of any real val set) must be placed replicated, not crash —
    surfaced by the train.py CLI roundtrip under an 8-device mesh."""
    import numpy as np

    from bcosification_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(8)
    batch = {
        "image": np.ones((5, 4, 4, 6), np.float32),
        "label": np.arange(5, dtype=np.int32),
    }
    out = mesh_lib.shard_batch(batch, mesh)  # 5 % 8 != 0 -> replicated
    np.testing.assert_array_equal(np.asarray(out["label"]), batch["label"])
    even = {
        "image": np.ones((16, 4, 4, 6), np.float32),
        "label": np.arange(16, dtype=np.int32),
    }
    out2 = mesh_lib.shard_batch(even, mesh)
    assert len(out2["image"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out2["label"]), even["label"])


def test_ema_cadence_under_grad_accumulation(tmp_path):
    """Under accumulate_grad_batches=k the EMA must mix every ema_steps
    OPTIMIZER steps (= ema_steps*k micro-steps), matching the reference's
    cadence (ref trainer.py:776-780) — gating on raw micro-steps would
    double-compensate the accum factor already in adjusted_ema_decay."""
    import sys
    import types

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_trainer_e2e import SynthDataModule, TinyNet, _fake_experiment

    import jax as _jax

    from bcosification_tpu.training.trainer import Trainer

    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(
        _jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )
    exp = _fake_experiment(tmp_path)
    exp.config["ema"] = {"decay": 0.999, "steps": 2}
    exp.config["trainer"]["accumulate_grad_batches"] = 2
    state = Trainer(exp).fit(model, variables, dm, max_epochs=1)
    # 4 micro-steps/epoch, accum 2 -> 2 optimizer steps; cadence ema_steps=2
    # optimizer steps = 4 micro-steps: exactly ONE ema update fires, at the
    # final micro-step, so ema == d*init + (1-d)*final_params elementwise.
    # A raw micro-step gate would fire a second update at micro-step 2 with
    # intermediate params and fail this equality.
    d = adjusted_ema_decay(
        0.999, world_size=1, batch_size=dm.batch_size, max_epochs=1,
        ema_steps=2, accumulate_grad_batches=2,
    )
    assert 0.0 < d < 1.0  # fixture sanity: the update actually mixes
    jax.tree_util.tree_map(
        lambda e, i, p: np.testing.assert_allclose(
            np.asarray(e), d * np.asarray(i) + (1 - d) * np.asarray(p),
            rtol=1e-6, atol=1e-7,
        ),
        jax.device_get(state.ema_params),
        jax.device_get(variables["params"]),
        jax.device_get(state.params),
    )


def test_metrics_csv_union_header(tmp_path):
    """A key set that grows mid-run (zeroshot data appearing) rewrites the
    csv with a union header instead of emitting ragged rows."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_trainer_e2e import _fake_experiment

    from bcosification_tpu.training.trainer import Trainer

    trainer = Trainer(_fake_experiment(tmp_path))
    trainer._log_metrics(0, {"val_acc1": 0.5, "train_loss": 1.0})
    trainer._log_metrics(1, {"val_acc1": 0.6, "train_loss": 0.9, "zs": 0.1})
    trainer._log_metrics(2, {"val_acc1": 0.7})
    lines = (trainer.save_dir / "metrics.csv").read_text().splitlines()
    header = lines[0].split(",")
    assert header == ["epoch", "train_loss", "val_acc1", "zs"]
    assert all(len(line.split(",")) == len(header) for line in lines[1:])
    assert lines[1].split(",") == ["0", "1.000000", "0.500000", ""]
    assert lines[3].split(",")[1] == "" and lines[3].split(",")[2] == "0.700000"

    # a resumed Trainer adopts the existing header
    trainer2 = Trainer(_fake_experiment(tmp_path))
    trainer2._log_metrics(3, {"val_acc1": 0.8})
    lines = (trainer.save_dir / "metrics.csv").read_text().splitlines()
    assert lines[0].split(",") == header
    assert len(lines[4].split(",")) == len(header)

"""End-to-end Trainer test: two epochs on a synthetic dataset, metrics
written, checkpoint saved, resume works, eval deterministic."""
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.losses import (
    BinaryCrossEntropyLoss,
    UniformOffLabelsBCEWithLogitsLoss,
)
from bcosification_tpu.optim import LRSchedulerFactory, OptimizerFactory
from bcosification_tpu.training.trainer import Trainer


class SynthDataModule:
    NUM_CLASSES = 4

    def __init__(self, n=32, batch_size=8):
        rng = np.random.default_rng(0)
        self.batch_size = batch_size
        self.labels = rng.integers(0, 4, n).astype(np.int32)
        # images whose channel means encode the label -> learnable quickly
        self.images = rng.random((n, 8, 8, 6)).astype(np.float32) * 0.1
        for i, l in enumerate(self.labels):
            self.images[i, ..., l % 4] += 0.8

    def setup(self, stage=None):
        pass

    def _loader(self):
        n = len(self.labels)
        for s in range(0, n, self.batch_size):
            yield {
                "image": self.images[s : s + self.batch_size],
                "label": self.labels[s : s + self.batch_size],
            }

    def train_dataloader(self, seed=0):
        class L:
            def __iter__(s):
                return self._loader()

            def __len__(s):
                return len(self.labels) // self.batch_size

            def set_epoch(s, e):
                pass

        self_outer = self
        loader = L()
        loader._loader = self._loader
        return loader

    val_dataloader = lambda self: self.train_dataloader()
    test_dataloader = val_dataloader


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False, explain=False):
        from bcosification_tpu.modules import BcosConv2d, norms

        x = BcosConv2d(features=8, kernel_size=3, padding=1)(x, train=train, explain=explain)
        x = norms.NoBias(norms.BatchNormUncentered2d)(features=8)(
            x, train=train, explain=explain
        )
        x = BcosConv2d(features=4, kernel_size=1)(x, train=train, explain=explain)
        return x.mean(axis=(1, 2))


def _fake_experiment(tmp_path):
    exp = types.SimpleNamespace()
    exp.config = dict(
        criterion=UniformOffLabelsBCEWithLogitsLoss(),
        test_criterion=BinaryCrossEntropyLoss(),
        optimizer=OptimizerFactory(name="Adam", lr=5e-3),
        lr_scheduler=LRSchedulerFactory(name="cosineannealinglr", epochs=3),
        trainer=dict(max_epochs=2),
        use_agc=True,
        model=dict(),
    )
    exp.save_dir = Path(tmp_path) / "exp"
    return exp


def test_trainer_fit_and_resume(tmp_path):
    model = TinyNet()
    dm = SynthDataModule()
    x0 = jnp.asarray(dm.images[:1])
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)

    exp = _fake_experiment(tmp_path)
    trainer = Trainer(exp, {"tensorboard_logger": True})
    state = trainer.fit(model, variables, dm, max_epochs=2)
    assert int(state.step) == 2 * 4  # 2 epochs x 4 batches

    # metrics persisted
    assert (exp.save_dir / "metrics.csv").exists()
    # hparams recorded by the logger backend at construction (regression:
    # a method insertion once orphaned this into unreachable code)
    hparam_files = list(exp.save_dir.rglob("hparams.json"))
    assert hparam_files, "no logger wrote hparams.json"
    metrics = trainer.experiment if False else None
    assert trainer.ckpt.available_checkpoints(), "checkpoints saved"

    # ImageNetEval parity (ref trainer.py:1090-1103): the pre-training
    # validation of the converted model is recorded at epoch -1 (json/
    # history only, not the fixed-schema csv)
    assert trainer.metrics_history["initial_val_acc1"][0][0] == -1

    with open(exp.save_dir / "metrics.csv") as f:
        header = f.readline()
    assert "initial" not in header

    # resume continues from epoch 2 -> runs only epoch 3
    trainer2 = Trainer(exp)
    state2 = trainer2.fit(model, variables, dm, max_epochs=3)
    assert int(state2.step) == 3 * 4

    # the persisted metric record keeps the PRE-resume epochs: the fresh
    # trainer's first wholesale metrics.json.gz rewrite must adopt the
    # existing file instead of truncating it to post-resume history
    # (r5 review)
    import gzip as _gzip
    import json as _json

    with _gzip.open(exp.save_dir / "metrics" / "metrics.json.gz", "rt") as f:
        hist = _json.load(f)
    assert [e for e, _ in hist["train_loss"]] == [0, 1, 2]
    assert [e for e, _ in hist["initial_val_acc1"]] == [-1]

    # --force-no-resume (ref train.py:40-46): resume=False starts from
    # scratch even though last checkpoints exist
    trainer3 = Trainer(exp)
    state3 = trainer3.fit(model, variables, dm, max_epochs=1, resume=False)
    assert int(state3.step) == 1 * 4

    # learned something: val_acc above chance
    import gzip
    import json

    with gzip.open(exp.save_dir / "metrics" / "metrics.json.gz", "rt") as f:
        hist = json.load(f)
    final_acc = hist["val_acc1"][-1][1]
    assert final_acc > 0.3


def test_trainer_fsdp_matches_replicated(tmp_path):
    """trainer.fsdp: true shards the TrainState over 'data' (ZeRO-3) with an
    unchanged step; the training trajectory must equal the replicated run."""
    import gzip
    import json

    class WideNet(nn.Module):
        # the middle conv (3,3,64,16) = 9216 params crosses fsdp's
        # MIN_LEAF_SIZE, so the flag has something real to shard
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            from bcosification_tpu.modules import BcosConv2d, norms

            f = dict(train=train, explain=explain)
            x = BcosConv2d(features=64, kernel_size=3, padding=1)(x, **f)
            x = norms.NoBias(norms.BatchNormUncentered2d)(features=64)(x, **f)
            x = BcosConv2d(features=16, kernel_size=3, padding=1)(x, **f)
            x = BcosConv2d(features=4, kernel_size=1)(x, **f)
            return x.mean(axis=(1, 2))

    def run(root, fsdp):
        model = WideNet()
        dm = SynthDataModule()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
        )
        exp = _fake_experiment(root)
        exp.config["trainer"]["fsdp"] = fsdp
        trainer = Trainer(exp)
        state = trainer.fit(model, variables, dm, max_epochs=2)
        sharded = any(
            "data" in str(getattr(l.sharding, "spec", ""))
            for l in jax.tree_util.tree_leaves(state.params)
        )
        with gzip.open(exp.save_dir / "metrics" / "metrics.json.gz", "rt") as f:
            return json.load(f), sharded

    h_rep, rep_sharded = run(tmp_path / "rep", False)
    h_fsdp, fsdp_sharded = run(tmp_path / "fsdp", True)
    assert not rep_sharded and fsdp_sharded
    for k in ("train_loss", "val_acc1"):
        a = [v for _, v in h_rep[k]]
        b = [v for _, v in h_fsdp[k]]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=k)


def test_trainer_tp_matches_replicated(tmp_path):
    """trainer.model_parallel: 4 shards ViT attn/MLP weights (+ their Adam
    moments and EMA shadows, path-suffix matched) over 'model'; training
    trajectories must equal the replicated run."""
    import gzip
    import json

    from bcosification_tpu.models import vit as vit_lib

    def run(root, mp, fsdp=False):
        model = vit_lib.SimpleViT(
            image_size=8, patch_size=4, num_classes=4, dim=32, depth=1,
            heads=4, mlp_dim=64,
        )
        dm = SynthDataModule()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
        )
        exp = _fake_experiment(root)
        exp.config["trainer"]["model_parallel"] = mp
        exp.config["trainer"]["fsdp"] = fsdp
        exp.config["trainer"]["fsdp_min_size"] = 1024  # tiny test weights
        trainer = Trainer(exp)
        state = trainer.fit(model, variables, dm, max_epochs=2)
        specs = {
            str(getattr(l.sharding, "spec", ""))
            for l in jax.tree_util.tree_leaves(state.params)
        }
        with gzip.open(exp.save_dir / "metrics" / "metrics.json.gz", "rt") as f:
            return json.load(f), specs

    h_rep, rep_specs = run(tmp_path / "rep", 1)
    h_tp, tp_specs = run(tmp_path / "tp", 4)
    h_2d, d2_specs = run(tmp_path / "2d", 4, fsdp=True)
    assert not any("model" in s for s in rep_specs)
    assert any("model" in s for s in tp_specs)
    # 2D: at least one weight carries BOTH axes (TP dim + FSDP dim)
    assert any("model" in s and "data" in s for s in d2_specs), d2_specs
    for k in ("train_loss", "val_acc1"):
        a = [v for _, v in h_rep[k]]
        for h in (h_tp, h_2d):
            b = [v for _, v in h[k]]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6, err_msg=k)


def test_trainer_pp_matches_replicated(tmp_path):
    """trainer.pipeline_parallel: 4 pipelines the SimpleViT encoder stack
    (GPipe over 'model'); the training trajectory must equal the plain run."""
    import gzip
    import json

    from bcosification_tpu.models import vit as vit_lib

    def run(root, pp, mp=1):
        model = vit_lib.SimpleViT(
            image_size=8, patch_size=4, num_classes=4, dim=32, depth=4,
            heads=4, mlp_dim=64,
        )
        dm = SynthDataModule()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
        )
        exp = _fake_experiment(root)
        exp.config["trainer"]["pipeline_parallel"] = pp
        if mp > 1:
            exp.config["trainer"]["model_parallel"] = mp
        trainer = Trainer(exp)
        trainer.fit(model, variables, dm, max_epochs=2)
        with gzip.open(exp.save_dir / "metrics" / "metrics.json.gz", "rt") as f:
            return json.load(f)

    # full 3D through the trainer: dp=2 x pipe=2 x model=2 (TP-sharded
    # state, GPipe stages, data-sharded batches) — same trajectory as the
    # replicated run. (Covers pure PP too — a pp-only fit was measured
    # identical; dropped to keep the quick suite lean on this 1-core host.)
    h_rep = run(tmp_path / "rep", 1)
    h_3d = run(tmp_path / "3d", 2, mp=2)
    for k in ("train_loss", "val_acc1"):
        a = [v for _, v in h_rep[k]]
        b = [v for _, v in h_3d[k]]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6, err_msg=k)

    # a CNN backbone is rejected loudly (PP pipelines SimpleViT stacks only)
    exp = _fake_experiment(tmp_path / "cnn")
    exp.config["trainer"]["pipeline_parallel"] = 4
    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )
    with pytest.raises(ValueError, match="SimpleViT"):
        Trainer(exp).fit(model, variables, dm, max_epochs=1)

    # clip_kd + PP is rejected at construction (fit() redirects to fit_kd
    # before the wrap — a silent pass-through would shrink the data axis
    # while never pipelining)
    exp_kd = _fake_experiment(tmp_path / "kd")
    exp_kd.config["clip_kd"] = True
    exp_kd.config["trainer"]["pipeline_parallel"] = 4
    with pytest.raises(ValueError, match="clip_kd"):
        Trainer(exp_kd)


def test_trainer_per_step_logging(tmp_path):
    """log_every_n_steps: per-step train_loss/lr events reach the loggers at
    the configured cadence with monotonically increasing global steps."""
    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )
    exp = _fake_experiment(tmp_path)
    trainer = Trainer(exp, {"log_every_n_steps": 2})

    records = []

    class Rec:
        def log_metrics(self, metrics, step):
            records.append((step, dict(metrics)))

        def log_image(self, *a, **k):
            pass

        def log_hparams(self, *a, **k):
            pass

        def finalize(self):
            pass

    trainer.loggers = [Rec()]
    trainer.fit(model, variables, dm, max_epochs=2)
    step_events = [(s, m) for s, m in records if "train_loss_step" in m]
    # 4 batches/epoch, cadence 2 -> steps 2,4 then 6,8
    assert [s for s, _ in step_events] == [2, 4, 6, 8], step_events
    assert all(np.isfinite(m["train_loss_step"]) for _, m in step_events)
    assert all("lr" in m for _, m in step_events)


def test_trainer_profile_dir_writes_trace(tmp_path):
    """--profile_dir captures a jax.profiler device trace during epoch 0."""
    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )
    exp = _fake_experiment(tmp_path)
    prof = tmp_path / "trace"
    trainer = Trainer(exp, {"profile_dir": str(prof)})
    trainer.fit(model, variables, dm, max_epochs=1)
    written = list(prof.rglob("*"))
    assert any(p.is_file() for p in written), written


def test_trainer_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-epoch (preemptible TPU VM reclaim, the reference's
    submitit-requeue scenario) checkpoints at the next step boundary, exits
    the fit cleanly, restores the previous handler, and a rerun of the same
    command resumes past the interrupted epoch."""
    import os
    import signal

    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )
    exp = _fake_experiment(tmp_path)
    trainer = Trainer(exp, {"log_every_n_steps": 2})

    sent = []

    class Preempter:  # fires SIGTERM from inside a PER-STEP event callback
        # (epoch-level rows — incl. the initial validation, which the
        # loggers now receive — must not trigger)
        def log_metrics(self, metrics, step):
            if "train_loss_step" in metrics and not sent:
                sent.append(step)
                os.kill(os.getpid(), signal.SIGTERM)

        log_image = log_hparams = finalize = lambda self, *a, **k: None

    before = signal.getsignal(signal.SIGTERM)
    trainer.loggers = [Preempter()]
    state = trainer.fit(model, variables, dm, max_epochs=5)
    # flag checked at the loop top: the step that logged (global step 2) is
    # the last one taken — 4 batches/epoch, so we stopped inside epoch 0
    assert int(state.step) == 2
    assert signal.getsignal(signal.SIGTERM) is before, "handler not restored"
    assert trainer.ckpt.epoch_metrics(0).get("steps_into_epoch") == 2.0

    # the supervisor reruns the same command: resume fast-forwards the
    # deterministic loader to step 2 of epoch 0 and completes all 5 epochs —
    # every batch trained exactly once
    trainer2 = Trainer(exp)
    state2 = trainer2.fit(model, variables, dm, max_epochs=5)
    assert int(state2.step) == 5 * 4

    # the preempted+resumed trajectory is BIT-IDENTICAL to an uninterrupted
    # run (same batch sequence, same step programs, deterministic CPU exec)
    exp_b = _fake_experiment(tmp_path / "baseline")
    state_b = Trainer(exp_b).fit(model, variables, dm, max_epochs=5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state2.params), jax.device_get(state_b.params),
    )

    # SIGTERM landing on the epoch's LAST step: the epoch completes
    # normally (scored checkpoint, no NaN metrics) and resume starts at the
    # NEXT epoch — never a whole-epoch fast-forward into empty metrics
    exp_c = _fake_experiment(tmp_path / "tail")
    trainer_c = Trainer(exp_c, {"log_every_n_steps": 4})  # fires at step 4/4
    sent.clear()
    trainer_c.loggers = [Preempter()]
    state_c = trainer_c.fit(model, variables, dm, max_epochs=5)
    assert int(state_c.step) == 4  # epoch 0 fully trained
    mets = trainer_c.ckpt.epoch_metrics(0)
    assert "preempted" not in mets and np.isfinite(mets.get("train_loss"))
    trainer_c2 = Trainer(exp_c)
    state_c2 = trainer_c2.fit(model, variables, dm, max_epochs=2)
    assert int(state_c2.step) == 8  # resumed at epoch 1

    # a pre-upgrade preemption checkpoint (no steps_into_epoch) falls back
    # to epoch-boundary resume instead of double-training the prefix
    idx_path = exp_c.save_dir / "checkpoints" / "index.json"
    import json as _json

    idx = _json.loads(idx_path.read_text())
    idx["epochs"][str(idx["last"])]["metrics"] = {"preempted": 1.0}
    idx_path.write_text(_json.dumps(idx))
    trainer_c3 = Trainer(exp_c)
    state_c3 = trainer_c3.fit(model, variables, dm, max_epochs=3)
    assert int(state_c3.step) == 12  # epoch 2 only: resumed AFTER epoch 1

    # a preemption record covering the WHOLE epoch (pre-upgrade tail-step
    # save) means the epoch is fully trained: resume at the next epoch, no
    # NaN-metrics fast-forward
    idx = _json.loads(idx_path.read_text())
    idx["epochs"][str(idx["last"])]["metrics"] = {
        "preempted": 1.0, "steps_into_epoch": 4.0,  # == steps_per_epoch
    }
    idx_path.write_text(_json.dumps(idx))
    state_c4 = Trainer(exp_c).fit(model, variables, dm, max_epochs=4)
    assert int(state_c4.step) == 16  # exactly one more epoch trained
    assert np.isfinite(Trainer(exp_c).ckpt.epoch_metrics(3).get("train_loss"))


def test_eval_deterministic(tmp_path):
    """evaluate.py:74-75 determinism contract: identical logits across runs."""
    model = TinyNet()
    dm = SynthDataModule()
    x = jnp.asarray(dm.images[:8])
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    a = np.asarray(fwd(variables, x))
    b = np.asarray(fwd(variables, x))
    np.testing.assert_array_equal(a, b)


def test_trainer_amp_bf16(tmp_path):
    """--amp (reference: PL precision=16) = bf16 activations, fp32 params;
    training still converges on the synthetic task."""
    model = TinyNet()
    dm = SynthDataModule()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dm.images[:1]), train=True
    )
    exp = _fake_experiment(tmp_path)
    trainer = Trainer(exp, args={"amp": True})
    state = trainer.fit(model, variables, dm, max_epochs=2)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # master weights fp32
    import gzip
    import json

    with gzip.open(exp.save_dir / "metrics" / "metrics.json.gz", "rt") as f:
        hist = json.load(f)
    assert hist["val_acc1"][-1][1] > 0.3

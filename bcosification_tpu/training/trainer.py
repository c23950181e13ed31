"""Training orchestration — the `run_training` loop.

Parity target: `/root/reference/bcos/training/training.py:14-89` (assembly) and
`ClassificationLitModel` (`/root/reference/bcos/training/trainer.py:369-910`):
config-driven criterion/optimizer/schedule, AGC, EMA (+adjusted decay), the
two-optimizer learnable-b variant (bcosify_trainer.py:76-165), checkpoints
(last + top-3 by val_acc1 / val_loss for KD), metrics tracking persisted to
metrics/*.gz, CSV logging, per-epoch validation, explanation logging, resume
from last.ckpt.

TPU-native structure: one jitted train_step under a data mesh; the host loop
only feeds sharded numpy batches and handles logging/checkpointing.
"""
from __future__ import annotations

import gzip
import json
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.parallel import mesh as mesh_lib
from bcosification_tpu.training import steps as steps_lib
from bcosification_tpu.training.checkpointing import CheckpointManager
from bcosification_tpu.training.ema import adjusted_ema_decay

__all__ = ["run_training", "build_train_state_template", "Trainer"]


def _make_optimizers(experiment, params, steps_per_epoch: int, dp_world: int = 1):
    """Build (tx, b_tx, log_schedule) from the experiment config.

    ``trainer.accumulate_grad_batches`` (the reference's PL kwarg, consumed in
    ref trainer.py:554 and training.py:73-80) wraps both optimizers in
    ``optax.MultiSteps``: gradients are averaged over k micro-batches and the
    inner optimizer (and its LR schedule) advances once per k. Note grad
    clipping/AGC in the train step applies per micro-batch gradient, before
    accumulation. The returned schedule is step-indexed by MICRO-batch (the
    TrainState step counter) for logging.
    """
    import optax

    config = experiment.config
    opt_factory = config["optimizer"]
    sched_factory = config.get("lr_scheduler")
    accum = int(config.get("trainer", {}).get("accumulate_grad_batches", 1) or 1)
    opt_steps_per_epoch = max(steps_per_epoch // accum, 1)
    schedule = (
        sched_factory.create(opt_factory.lr, opt_steps_per_epoch)
        if sched_factory is not None
        else opt_factory.lr
    )
    tx = opt_factory.create(schedule, params)

    b_tx = None
    bargs = config.get("model", {}).get("bcosify_args", {}) or {}
    if bargs.get("manual_optim", False):
        # auxiliary SGD over the learnable b params; the reference scales its
        # lr by the DP world size (num_gpus, bcosify_trainer.py:88-107) —
        # here that is the mesh's 'data' axis extent, passed by the Trainer
        # (1 for shape-only template builds, where lr doesn't matter)
        b_opt_factory = config.get("b_optimizer", opt_factory.with_name("sgd"))
        b_tx = b_opt_factory.with_args(bcosify=True, b_opt=True).create(
            b_opt_factory.lr * dp_world, params
        )
    log_schedule = schedule
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
        if b_tx is not None:
            b_tx = optax.MultiSteps(b_tx, every_k_schedule=accum)
        if callable(schedule):
            log_schedule = lambda step: schedule(step // accum)  # noqa: E731
    return tx, b_tx, log_schedule


def build_train_state_template(experiment, model, variables) -> steps_lib.TrainState:
    """Abstract TrainState matching what training produces — for checkpoint
    restore shape/dtype resolution."""
    tx, b_tx, _ = _make_optimizers(experiment, variables["params"], steps_per_epoch=1)
    with_ema = experiment.config.get("ema", None) is not None
    return steps_lib.create_train_state(variables, tx, b_tx, with_ema=with_ema)


class Trainer:
    """Host-side training driver."""

    def __init__(self, experiment, args=None, mesh=None):
        self.experiment = experiment
        self.config = experiment.config
        self.args = args or {}
        tcfg0 = self.config.get("trainer", {})
        mp = int(tcfg0.get("model_parallel", 1) or 1)
        pp = int(tcfg0.get("pipeline_parallel", 1) or 1)
        if pp > 1 and self.config.get("clip_kd", False):
            # fail loudly: fit() redirects to fit_kd BEFORE the PP wrap, so a
            # silent pass-through would shrink the data axis by the PP factor
            # while never actually pipelining anything
            raise ValueError(
                "trainer.pipeline_parallel is not supported for clip_kd "
                "experiments (the KD student is a CNN tower; use DP/FSDP)"
            )
        # PP always gets the dedicated 'pipe' axis — one mesh layout whether
        # or not TP is on ('model' stays the TP degree, 1 when unused)
        self.mesh = mesh or mesh_lib.make_mesh(
            model_parallel=mp, pipeline_parallel=pp
        )
        self.save_dir = experiment.save_dir
        self.save_dir.mkdir(parents=True, exist_ok=True)
        monitor = "val_loss" if self._is_clip_kd() else "val_acc1"
        self.ckpt = CheckpointManager(
            str(self.save_dir),
            monitor=monitor,
            mode="min" if monitor == "val_loss" else "max",
        )
        self.metrics_history: Dict[str, list] = {}
        self._csv_keys: Optional[list] = None  # metrics.csv header, fixed lazily
        from bcosification_tpu.training.loggers import setup_loggers

        # multi-host: only process 0 opens logger backends / writes metric
        # files (PL rank_zero_only semantics); the metric history itself is
        # still tracked everywhere (it's cheap and keeps behaviour identical)
        self._io_process = mesh_lib.is_main_process()
        self.loggers = setup_loggers(self.args, self.save_dir) if self._io_process else []
        for lg in self.loggers:
            lg.log_hparams(self.config)
        # per-step event logging cadence (PL's log_every_n_steps default);
        # 0 or negative disables the per-step device syncs entirely
        n = self.args.get("log_every_n_steps", 50)
        self._log_every_n_steps = int(n) if n is not None and int(n) > 0 else 0
        self._gather_fn = None  # cached jitted all-gather, built on first use

    def _install_preemption_handler(self):
        """SIGTERM -> checkpoint-and-exit at the next step boundary.

        The TPU-native analogue of the reference's submitit auto-requeue
        (`/root/reference/run_with_submitit.py:46-49` + SLURM's 4-minute
        grace signal): preemptible TPU VMs / queued resources send SIGTERM
        before reclaim; the fit loops notice the flag after the in-flight
        step, save a 'last' checkpoint (tagged with the interrupted epoch +
        `steps_into_epoch`, metrics unscored so top-k stays honest) and
        return cleanly — the supervisor restarts the same command and
        `resume=True` redoes the interrupted epoch from exactly that step
        (sample ORDER is deterministic per set_epoch, so fast-forwarding
        skips the already-trained batches: no sample lost or double-trained).
        With seeded augmentation draws (the native loader, WdsPipeline, or a
        deterministic pipeline as in the test) the resumed trajectory is
        bit-identical to an uninterrupted run; the PIL transforms draw fresh
        entropy per call, so there only the sample sequence — not the random
        crops — is reproduced. The reference's requeue (PL saves last.ckpt
        at epoch end)
        discards the whole partial epoch. Multi-host: the save gathers
        sharded state — a collective
        every process joins — so supervisors must signal ALL processes (the
        normal preemption behaviour for a whole slice).

        Returns a restore() that reinstates the previous handler. No-op off
        the main thread (signal.signal is main-thread-only)."""
        import signal
        import threading

        self._preempt_requested = False
        if threading.current_thread() is not threading.main_thread():
            return lambda: None

        def handler(signum, frame):
            self._preempt_requested = True
            print(
                "SIGTERM received — checkpointing at the next step boundary; "
                "resume with the same command"
            )

        try:
            prev = signal.signal(signal.SIGTERM, handler)
        except ValueError:  # non-main interpreter contexts
            return lambda: None
        return lambda: signal.signal(signal.SIGTERM, prev)

    def _place_state(self, state):
        """Place the TrainState on the mesh (beyond-reference scale-out; the
        reference's DDP regime — fully replicated — is the default):

        - ``trainer.model_parallel: mp`` — Megatron TP over the 'model' axis.
          tp_param_specs matches path suffixes (attn/ff linears), so mapping
          it over the WHOLE TrainState shards params, Adam moments and EMA
          shadows consistently (parallel/tp.py).
        - ``trainer.fsdp: true`` — ZeRO-3 over 'data'; composes with TP as 2D
          weight sharding via fsdp2d_specs (parallel/fsdp.py).
        Step functions are unchanged either way (GSPMD places collectives).
        """
        tcfg = self.config.get("trainer", {})
        mp = int(tcfg.get("model_parallel", 1) or 1)
        use_fsdp = bool(tcfg.get("fsdp", False))
        if mp <= 1 and not use_fsdp:
            return mesh_lib.replicate(state, self.mesh)

        from bcosification_tpu.parallel import fsdp as fsdp_lib
        from bcosification_tpu.parallel import tp as tp_lib

        min_size = int(tcfg.get("fsdp_min_size", fsdp_lib.MIN_LEAF_SIZE))
        if mp > 1:
            specs = tp_lib.tp_param_specs(state)
            if use_fsdp:
                specs = fsdp_lib.fsdp2d_specs(
                    state, self.mesh, specs, min_size=min_size
                )
        else:
            specs = fsdp_lib.fsdp_state_specs(state, self.mesh, min_size=min_size)
        return fsdp_lib.shard_state(state, self.mesh, specs)

    def _host_state(self, tree):
        """device_get that is safe for FSDP/TP-sharded state on multi-host
        meshes: shards then span non-addressable devices, so first gather to
        fully replicated (a jitted identity with replicated out_shardings —
        an all-gather over ICI that every process participates in), then
        fetch. Single-process meshes skip the gather (all shards local)."""
        if jax.process_count() > 1:
            if self._gather_fn is None:
                rep = jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec()
                )
                # cache the jitted identity so each checkpoint save reuses
                # one compiled gather instead of re-tracing a fresh lambda.
                # NOTE: this replicates the full state on every device for
                # the duration of the fetch — the simple/robust choice; a
                # per-leaf chunked gather would cap the transient memory.
                self._gather_fn = jax.jit(lambda t: t, out_shardings=rep)
            tree = self._gather_fn(tree)
        return jax.device_get(tree)

    @staticmethod
    def param_hash(tree) -> str:
        """Short content hash of a param PyTree.

        Working equivalent of the reference's `ModelUpdateHasher` debug
        callback (referenced at trainer.py:1045 but absent from
        bcos/training/callbacks/ — the reference's --debug path would crash);
        used to confirm what is (or is not, e.g. a frozen teacher) updating.
        """
        import hashlib

        h = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(tree):
            h.update(np.asarray(jax.device_get(leaf)).tobytes())
        return h.hexdigest()[:16]

    def _is_clip_kd(self):
        margs = self.config.get("model", {}).get("bcosify_args", {}) or {}
        return bool(margs.get("clip_kd", False))

    # -- logging ---------------------------------------------------------------
    def _log_metrics(
        self,
        epoch: int,
        metrics: Dict[str, float],
        csv: bool = True,
        logger_step: Optional[int] = None,
    ):
        """Record epoch metrics. ``logger_step``: global-step index for the
        event-stream backends — MUST share the per-step events' step domain
        (wandb drops lower-step logs, TB charts garble when 'lr' is written
        at both epoch and step indices); falls back to epoch when no per-step
        logging happens."""
        if not self.metrics_history:
            # resumed run: adopt the persisted record before the first write
            # so the wholesale rewrite below cannot truncate pre-preemption
            # epochs out of metrics.json.gz (the CSV path does the same via
            # its header adoption)
            prev = self.save_dir / "metrics" / "metrics.json.gz"
            if prev.exists():
                try:
                    with gzip.open(prev, "rt") as f:
                        self.metrics_history = {
                            k: [(int(e), float(v)) for e, v in rows]
                            for k, rows in json.load(f).items()
                        }
                except (OSError, ValueError) as e:
                    print(f"metrics.json.gz unreadable, starting fresh: {e}")
        for k, v in metrics.items():
            hist = self.metrics_history.setdefault(k, [])
            # drop rows from a partially-trained epoch being re-run
            while hist and hist[-1][0] >= epoch:
                hist.pop()
            hist.append((epoch, float(v)))
        if not self._io_process:
            return
        mdir = self.save_dir / "metrics"
        mdir.mkdir(exist_ok=True)
        with gzip.open(mdir / "metrics.json.gz", "wt") as f:
            json.dump(self.metrics_history, f)
        # event-stream backends get every row, including one-off csv=False
        # rows (the initial conversion-quality eval) — clamped to step 0,
        # which also keeps the TB varint encoder off negative values
        step = epoch if logger_step is None else logger_step
        for lg in self.loggers:
            lg.log_metrics(metrics, step=max(int(step), 0))
        if not csv:  # one-off rows (initial eval) stay out of the fixed csv
            return
        csv_path = self.save_dir / "metrics.csv"
        keys = sorted(metrics)
        if self._csv_keys is None and csv_path.exists():
            with open(csv_path) as f:  # resumed run: adopt the existing header
                self._csv_keys = f.readline().strip().split(",")[1:]
        if self._csv_keys is None:
            self._csv_keys = keys
            with open(csv_path, "w") as f:
                f.write("epoch," + ",".join(keys) + "\n")
        elif any(k not in self._csv_keys for k in keys):
            # the key set grew (e.g. zeroshot data appeared mid-run): rewrite
            # with the union header so rows never go ragged/misaligned
            old_keys, old_rows = self._csv_keys, []
            if csv_path.exists():
                old_rows = [
                    line.split(",")
                    for line in csv_path.read_text().splitlines()[1:]
                ]
            self._csv_keys = sorted(set(old_keys) | set(keys))
            with open(csv_path, "w") as f:
                f.write("epoch," + ",".join(self._csv_keys) + "\n")
                for row in old_rows:
                    d = dict(zip(old_keys, row[1:]))
                    f.write(
                        row[0] + ","
                        + ",".join(d.get(k, "") for k in self._csv_keys) + "\n"
                    )
        with open(csv_path, "a") as f:
            f.write(
                f"{epoch},"
                + ",".join(
                    f"{metrics[k]:.6f}" if k in metrics else ""
                    for k in self._csv_keys
                )
                + "\n"
            )

    # -- main loop ---------------------------------------------------------------
    def fit(
        self,
        model,
        variables,
        datamodule,
        max_epochs: Optional[int] = None,
        fast_dev_run: bool = False,
        explanation_logging: bool = False,
        explanation_logging_every_n_epochs: int = 1,
        resume: bool = True,
    ):
        if self.config.get("clip_kd", False):
            return self.fit_kd(
                model, variables, datamodule, max_epochs=max_epochs,
                fast_dev_run=fast_dev_run, resume=resume,
            )
        config = self.config
        pp = int(config.get("trainer", {}).get("pipeline_parallel", 1) or 1)
        if pp > 1:
            from bcosification_tpu.models.vit import SimpleViT
            from bcosification_tpu.parallel.pp_vit import PipelinedViT

            if not isinstance(model, SimpleViT):
                raise ValueError(
                    "trainer.pipeline_parallel pipelines SimpleViT encoder "
                    f"stacks; got {type(model).__name__} — use DP/FSDP/TP for "
                    "CNN backbones (docs/SCALING.md)"
                )
            model = PipelinedViT(
                model,
                self.mesh,
                config.get("trainer", {}).get("pp_microbatches"),
            )
        max_epochs = max_epochs or config.get("trainer", {}).get("max_epochs", 90)
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader(seed=config.get("seed", 0) or 0)
        steps_per_epoch = max(len(train_loader), 1)

        tx, b_tx, schedule = _make_optimizers(
            self.experiment, variables["params"], steps_per_epoch,
            dp_world=int(self.mesh.shape.get(mesh_lib.DATA_AXIS, 1)),
        )

        # opt-in multi-host input scaling (docs/SCALING.md): with a
        # per-process train sampler (data.split_by_process) each host's
        # batch is a LOCAL slice of the global batch
        split_local = bool(config.get("data", {}).get("split_by_process", False))
        if split_local and config.get("data", {}).get("p_gridified", 0.0):
            # SplitAndGrid shrinks collated batches to a data-dependent size;
            # make_array_from_process_local_data (shard_batch_local) requires
            # every host's local batch to match the per-process shard extent,
            # and the replicated fallback shard_batch uses is wrong when
            # hosts hold DIFFERENT local data — reject loudly instead of
            # crashing (or silently diverging) on the first step.
            raise ValueError(
                "data.split_by_process is incompatible with data.p_gridified "
                "(SplitAndGrid yields variable-size batches that cannot be "
                "stitched from per-process local slices); unset one of them"
            )

        accum = int(
            config.get("trainer", {}).get("accumulate_grad_batches", 1) or 1
        )
        ema_config = config.get("ema", None)
        ema_decay = None
        ema_steps = 32
        if ema_config is not None:
            ema_steps = ema_config.get("steps", 32)
            # the reference formula's world_size*batch_size is the GLOBAL
            # per-micro-step batch (ref trainer.py:540-561). Here the loader
            # batch IS the global batch — devices SHARD it, they don't
            # multiply it — except on the split_by_process path where each
            # of process_count hosts contributes a local slice.
            world = jax.process_count() if split_local else 1
            ema_decay = adjusted_ema_decay(
                ema_config["decay"],
                world_size=world,
                batch_size=datamodule.batch_size,
                max_epochs=max_epochs,
                ema_steps=ema_steps,
                accumulate_grad_batches=accum,
            )

        bargs = config.get("model", {}).get("bcosify_args", {}) or {}
        b_schedule = None
        if bargs.get("linear_b", False) and not bargs.get("b_loss", False):
            # The reference's forced-gradient hook + dedicated SGD
            # (hooks.py:7-23, bcosify_trainer.py:88-107) in closed form.
            # world_size * batch_size must be the GLOBAL per-step batch
            # (= the reference's num_gpus * per_gpu_batch): on the default
            # path the loader batch IS global (devices shard it), on
            # split_by_process each of process_count hosts adds a local
            # slice — same convention as adjusted_ema_decay above.
            b_schedule = steps_lib.make_linear_b_schedule(
                b_at_start=bargs.get("b_at_start", 1),
                b_at_end=bargs.get("b_at_end", 2),
                b_lr=bargs.get("b_lr", 0.0001),
                world_size=jax.process_count() if split_local else 1,
                batch_size=datamodule.batch_size,
            )
        elif bargs.get("b_interpolation", False):
            # repo extension: b 1 -> 2 as a fraction of total training,
            # independent of batch size / lr (a step-count reparameterisation
            # of the same linear trajectory)
            total = max_epochs * steps_per_epoch

            def b_schedule(step):  # noqa: F811
                return 1.0 + jnp.clip(step / total, 0.0, 1.0)

        train_step = steps_lib.make_train_step(
            model,
            config["criterion"],
            tx,
            b_tx,
            use_agc=config.get("use_agc", False),
            gradient_clip_val=config.get("trainer", {}).get("gradient_clip_val"),
            ema_decay=ema_decay,
            # TrainState.step counts MICRO-steps; the reference updates EMA
            # every ema_steps OPTIMIZER steps (ref trainer.py:776-780), so
            # under gradient accumulation the gate cadence stretches by
            # accum (the decay formula above already carries the accum
            # factor — gating on micro-steps would double-compensate)
            ema_steps=ema_steps * accum,
            b_schedule=b_schedule,
            amp=bool(self.args.get("amp", False)),
        )
        eval_step = steps_lib.make_eval_step(model, config.get("test_criterion"))
        eval_step_ema = (
            steps_lib.make_eval_step(model, config.get("test_criterion"), use_ema=True)
            if ema_config is not None
            else None
        )

        state = steps_lib.create_train_state(
            variables, tx, b_tx, with_ema=ema_config is not None
        )

        # resume (training.py:82-89); --force-no-resume (ref train.py:40-46)
        # starts from scratch even when a last checkpoint exists. A
        # preemption checkpoint resumes EXACTLY: redo the interrupted epoch,
        # fast-forwarding the (deterministic per set_epoch) loader past the
        # already-trained steps — no sample skipped or double-trained.
        start_epoch = 0
        skip_steps = 0
        was_restored = False
        if resume:
            restored, last_epoch = self.ckpt.restore(state, "last")
            if restored is not None:
                was_restored = True
                m = self.ckpt.epoch_metrics(last_epoch)
                # exact mid-epoch resume needs the recorded step position; a
                # pre-upgrade preemption checkpoint lacks it — fall back to
                # the old epoch-boundary semantics rather than double-train
                # the epoch's prefix on mid-epoch optimizer state
                if m.get("preempted") and m.get("steps_into_epoch") is not None:
                    state, start_epoch = restored, last_epoch
                    skip_steps = int(m["steps_into_epoch"])
                    if skip_steps >= steps_per_epoch:
                        # the record covers the whole epoch (a pre-upgrade
                        # tail-step preemption, or the dataset shrank): it
                        # was fully trained and only lacked validation —
                        # fast-forwarding it would log a NaN-metrics epoch
                        start_epoch, skip_steps = last_epoch + 1, 0
                        print(f"Resuming from epoch {last_epoch} (preempted "
                              f"after its last step)")
                    else:
                        print(
                            f"Resuming mid-epoch {last_epoch} "
                            f"(fast-forwarding {skip_steps} steps)"
                        )
                else:
                    state, start_epoch = restored, last_epoch + 1
                    print(f"Resuming from epoch {last_epoch}")

        state = self._place_state(state)

        # install the SIGTERM handler before the initial validation too: a
        # reclaim landing during that (full val-set) pass must flag-and-exit
        # at the first train step, not kill the process mid-eval
        restore_sigterm = self._install_preemption_handler()

        # ImageNetEval (ref trainer.py:1090-1103): evaluate the freshly
        # converted model on the validation split BEFORE any training — the
        # conversion-quality metric (a b=1 conversion must start at the
        # pretrained model's accuracy). Skipped on resume — including a
        # mid-epoch-0 preemption resume, where start_epoch is still 0 but
        # the weights are no longer the conversion — and in KD (which has
        # its own zeroshot eval), like the reference.
        if start_epoch == 0 and not was_restored and not fast_dev_run:
            init_metrics = self.validate(eval_step, state, datamodule)
            if init_metrics:
                print(
                    "initial (pre-training) validation: "
                    + ", ".join(f"{k}={v:.4f}" for k, v in init_metrics.items())
                )
                self._log_metrics(
                    -1,
                    {f"initial_{k}": v for k, v in init_metrics.items()},
                    csv=False,
                )

        # --profile_dir: capture a jax.profiler device trace of steps 3-8 of
        # the first trained epoch (post-compile, pre-steady-state-noise) —
        # the TPU-native replacement for the reference's tqdm-rate-only
        # observability (SURVEY §5); view with TensorBoard/XProf. Epochs
        # shorter than the window (incl. --fast_dev_run's single step) clamp
        # it so a trace is always produced — then it includes compilation.
        profile_dir = self.args.get("profile_dir")
        profile_window = None
        if profile_dir and self._io_process:
            last = 0 if fast_dev_run else max(steps_per_epoch - 1, 0)
            profile_window = (min(3, last), min(8, last))
            if profile_window[0] < 3:
                print(
                    f"profiler: short epoch — tracing steps "
                    f"{profile_window[0]}-{profile_window[1]} incl. compile"
                )

        put_train = (
            mesh_lib.shard_batch_local if split_local else mesh_lib.shard_batch
        )

        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            train_loader.set_epoch(epoch)
            losses, accs, n_steps = [], [], 0
            skipped = skip_steps if epoch == start_epoch else 0
            skip_left = skipped
            interrupted = False  # preempted strictly mid-epoch
            for batch in train_loader:
                if self._preempt_requested:  # checked before the skip so a
                    interrupted = True  # 2nd SIGTERM during a long
                    break  # fast-forward still exits promptly
                if skip_left:  # fast-forward a preempted epoch (the loader
                    skip_left -= 1  # still decodes; training is skipped —
                    continue  # simple and exact; decode-only cost
                batch = put_train(batch, self.mesh)
                if profile_window and n_steps == profile_window[0]:
                    jax.profiler.start_trace(profile_dir)
                state, metrics = train_step(state, batch)
                if profile_window and n_steps == profile_window[1]:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {profile_dir}")
                    profile_window = None
                losses.append(metrics["loss"])
                accs.append(metrics["acc1"])
                n_steps += 1
                # per-step event-stream logging (PL's log_every_n_steps=50
                # default, ref trainer logs train loss on_step) — the float()
                # fetch syncs the device, so only every N steps
                if (self.loggers and self._log_every_n_steps
                        and n_steps % self._log_every_n_steps == 0):
                    gstep = epoch * steps_per_epoch + skipped + n_steps
                    step_metrics = {
                        "train_loss_step": float(metrics["loss"]),
                        "lr": float(schedule(state.step))
                        if callable(schedule) else schedule,
                    }
                    for lg in self.loggers:
                        lg.log_metrics(step_metrics, step=gstep)
                if fast_dev_run:
                    break
            if profile_window and n_steps <= profile_window[1]:
                # epoch ended inside the window (ragged loader) — close the
                # trace after draining in-flight steps so device ops land
                if n_steps > profile_window[0]:
                    if losses:
                        jax.block_until_ready(losses[-1])
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {profile_dir}")
                profile_window = None
            if interrupted:
                # SIGTERM after the epoch's LAST step leaves interrupted
                # False: the epoch then completes normally (validation +
                # scored checkpoint) and the post-save break below exits —
                # a resumed run must never fast-forward a whole epoch into
                # empty (NaN) metrics.
                # The state's position is restored-steps + newly-trained
                # steps. NOT (skipped - skip_left): a 2nd SIGTERM landing
                # mid-fast-forward has trained nothing, but the restored
                # weights still correspond to `skipped` steps — recording
                # less would double-train the un-skipped prefix next time.
                done = skipped + n_steps
                self.ckpt.save(
                    self._host_state(state), epoch,
                    {"preempted": 1.0, "steps_into_epoch": float(done)},
                )
                print(
                    f"preempted during epoch {epoch} after {done} steps: "
                    f"'last' checkpoint saved; resume with the same command"
                )
                break
            if not losses:
                print(
                    f"note: fast-forward consumed every batch of epoch "
                    f"{epoch} (loader shrank below the preemption record?); "
                    f"validation only" if skipped else
                    "WARNING: train loader yielded no batches — dataset "
                    "smaller than batch_size with drop_last=True? Metrics "
                    "for this epoch are NaN."
                )
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            train_acc = float(jnp.mean(jnp.stack(accs))) if accs else float("nan")

            val_metrics = self.validate(eval_step, state, datamodule)
            epoch_metrics = {
                "train_loss": train_loss,
                "train_acc1": train_acc,
                "epoch_time_s": time.time() - t0,
                "lr": float(schedule(state.step)) if callable(schedule) else schedule,
                **val_metrics,
            }
            if eval_step_ema is not None:
                ema_metrics = self.validate(eval_step_ema, state, datamodule)
                epoch_metrics.update({f"{k}_ema": v for k, v in ema_metrics.items()})

            self._log_metrics(
                epoch, epoch_metrics,
                logger_step=(epoch + 1) * steps_per_epoch,
            )
            self.ckpt.save(self._host_state(state), epoch, epoch_metrics)
            print(
                f"epoch {epoch}: loss {train_loss:.4f} acc {train_acc:.4f} "
                f"val_acc1 {val_metrics.get('val_acc1', float('nan')):.4f} "
                f"({epoch_metrics['epoch_time_s']:.1f}s)"
            )
            if self.args.get("debug"):
                print(f"  params hash: {self.param_hash(state.params)}")

            if explanation_logging and (
                epoch % explanation_logging_every_n_epochs == 0
            ):
                self._log_explanations(model, state, datamodule, epoch)

            if self._preempt_requested:  # raised during the final step or
                # validation: the epoch completed and is checkpointed
                # normally — resume continues at the next epoch
                print(
                    f"preempted at the end of epoch {epoch}: checkpoint "
                    f"saved; resume with the same command"
                )
                break
            if fast_dev_run:
                break
        restore_sigterm()
        for lg in self.loggers:
            lg.finalize()
        return state

    def fit_kd(
        self,
        model,
        variables,
        datamodule,
        max_epochs: Optional[int] = None,
        fast_dev_run: bool = False,
        resume: bool = True,
    ):
        """SigLIP knowledge distillation (trainer.py:652-724 + callbacks):
        frozen CLIP teacher (the tower matching the student's model.name),
        B-cosified student, per-epoch val loss and (when data is reachable)
        CLIP zeroshot eval."""
        from bcosification_tpu.clip.load import (
            MODEL_CONFIG_CLIP_NAMES,
            load as clip_load,
        )
        from bcosification_tpu.training import kd as kd_lib

        config = self.config
        max_epochs = max_epochs or config.get("trainer", {}).get("max_epochs", 90)
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader(seed=config.get("seed", 0) or 0)
        if getattr(train_loader, "mode", None) == "pair":
            # KD uses images only (the captions are dropped at the top of the
            # batch loop) — skip the per-batch BPE tokenization of every
            # caption on the 1-core input hot path. Validation/zeroshot
            # loaders are untouched.
            train_loader.mode = "image"
        try:
            steps_per_epoch = max(len(train_loader), 1)
        except TypeError:  # webdataset pipelines have no len
            steps_per_epoch = config.get("steps_per_epoch", 5000)

        clip_name = MODEL_CONFIG_CLIP_NAMES.get(
            self.config.get("model", {}).get("name", "resnet50clip"), "RN50"
        )
        teacher, teacher_vars, text_model, text_vars, _, _ = clip_load(clip_name)
        teacher_vars = mesh_lib.replicate(teacher_vars, self.mesh)

        tx, _, schedule = _make_optimizers(
            self.experiment, variables["params"], steps_per_epoch
        )
        mcfg = config.get("model", {})
        kd_cos_power = (
            int(mcfg.get("cos_power", 1)) if mcfg.get("attn_unpool") else 0
        )
        train_step = kd_lib.make_kd_train_step(
            model,
            teacher,
            teacher_vars,
            tx,
            logit_scale=float(mcfg.get("logit_scale_value", 10)),
            logit_bias=float(mcfg.get("logit_bias_value", -10)),
            cos_power=kd_cos_power,
            use_agc=config.get("use_agc", True),
            loss_mode=config.get("siglip_loss_mode", "global"),
            mesh=self.mesh,
            amp=bool(self.args.get("amp", False)),
        )
        state = steps_lib.create_train_state(variables, tx)

        start_epoch = 0
        skip_steps = 0
        if resume:
            restored, last_epoch = self.ckpt.restore(state, "last")
            if restored is not None:
                m = self.ckpt.epoch_metrics(last_epoch)
                # exact mid-epoch resume (see fit()); pre-upgrade preemption
                # checkpoints lack the step position -> epoch-boundary resume
                if m.get("preempted") and m.get("steps_into_epoch") is not None:
                    state, start_epoch = restored, last_epoch
                    skip_steps = int(m["steps_into_epoch"])
                    if (hasattr(train_loader, "__len__")
                            and skip_steps >= len(train_loader) > 0):
                        # whole epoch already trained (see fit())
                        start_epoch, skip_steps = last_epoch + 1, 0
                        print(f"Resuming from epoch {last_epoch} (preempted "
                              f"after its last step)")
                    else:
                        print(
                            f"Resuming mid-epoch {last_epoch} "
                            f"(fast-forwarding {skip_steps} steps)"
                        )
                else:
                    state, start_epoch = restored, last_epoch + 1
                    print(f"Resuming from epoch {last_epoch}")
        state = self._place_state(state)

        @jax.jit
        def val_step(params, batch_stats, images):
            from bcosification_tpu.losses import SigLipLoss

            t_feat, s_out, _ = kd_lib.kd_forward_features(
                model,
                teacher,
                {"params": params, "batch_stats": batch_stats},
                teacher_vars,
                images,
                train=False,
            )
            # eps guards 0/0 for degenerate (e.g. random-init smoke-run)
            # features; pretrained weights always have nonzero norms
            s = s_out / (jnp.linalg.norm(s_out, axis=-1, keepdims=True) + 1e-8)
            t = t_feat / (jnp.linalg.norm(t_feat, axis=-1, keepdims=True) + 1e-8)
            if s.ndim == 3:
                # attn_unpool: batch-first -> SigLipLoss's location-first
                # (HW, B, D) convention, same as the train loss (kd.py)
                s = jnp.swapaxes(s, 0, 1)
            return SigLipLoss()(s, t, 10.0, -10.0, cos_scaling=kd_cos_power)

        # --profile_dir works here too (wds loaders may not expose a length,
        # so the window is closed at epoch end if the loader runs short)
        profile_dir = self.args.get("profile_dir")
        profile_window = None
        if profile_dir and self._io_process:
            profile_window = (0, 0) if fast_dev_run else (3, 8)

        # opt-in multi-host input scaling: with per-process train shards
        # (data.split_shards_by_process) each host's batch is a LOCAL slice
        # of the global batch — stitch with shard_batch_local; otherwise
        # every host yields the identical global batch (shard_batch)
        split_local = bool(
            config.get("data", {}).get("split_shards_by_process", False)
        )
        put_train = (
            mesh_lib.shard_batch_local if split_local else mesh_lib.shard_batch
        )

        # a repeating loader (multi-host split shards) yields an INFINITE
        # stream: every host must run the same step count per epoch, so the
        # epoch is closed at steps_per_epoch (identical on all hosts — the
        # jitted train_step is a collective program)
        step_cap = (
            steps_per_epoch if getattr(train_loader, "repeat", False) else None
        )
        restore_sigterm = self._install_preemption_handler()
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            losses = []
            skipped = skip_steps if epoch == start_epoch else 0
            skip_left = skipped
            seen = 0  # batches consumed this epoch (skipped + trained)
            interrupted = False  # preempted strictly mid-epoch (see fit())
            for batch in train_loader:
                if self._preempt_requested:
                    interrupted = True
                    break
                seen += 1
                if skip_left:  # fast-forward a preempted epoch
                    skip_left -= 1
                    if step_cap is not None and seen >= step_cap:
                        break
                    continue
                batch = {"image": batch["image"]}
                batch = put_train(batch, self.mesh)
                if profile_window and len(losses) == profile_window[0]:
                    jax.profiler.start_trace(profile_dir)
                state, metrics = train_step(state, batch)
                if profile_window and len(losses) == profile_window[1]:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {profile_dir}")
                    profile_window = None
                losses.append(metrics["loss"])
                # per-step events matter most here: CC3M KD epochs are hours
                if (self.loggers and self._log_every_n_steps
                        and len(losses) % self._log_every_n_steps == 0):
                    step_metrics = {"train_loss_step": float(metrics["loss"])}
                    for lg in self.loggers:
                        lg.log_metrics(step_metrics, step=int(state.step))
                if fast_dev_run:
                    break
                if step_cap is not None and seen >= step_cap:
                    break  # common per-host epoch length (repeating stream)
            if profile_window and len(losses) <= profile_window[1]:
                # epoch ended inside the window — close after draining
                if len(losses) > profile_window[0]:
                    if losses:
                        jax.block_until_ready(losses[-1])
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {profile_dir}")
                profile_window = None
            if interrupted:
                done = skipped + len(losses)  # see fit(): restored position
                # + newly-trained; never (skipped - skip_left)
                self.ckpt.save(
                    self._host_state(state), epoch,
                    {"preempted": 1.0, "steps_into_epoch": float(done)},
                )
                print(
                    f"preempted during epoch {epoch} after {done} steps: "
                    f"'last' checkpoint saved; resume with the same command"
                )
                break
            if skipped and not losses and not interrupted and not fast_dev_run:
                # resume guard for length-less (wds) loaders: the preemption
                # hit AFTER this epoch's final step, so the fast-forward
                # consumed the whole stream without training. The sized-
                # loader case promotes at restore time (skip_steps >=
                # len(train_loader)); here the length is only learnable by
                # exhaustion — promote to the next epoch instead of logging
                # a NaN train_loss for a fully-trained epoch.
                print(
                    f"epoch {epoch} was already fully trained before the "
                    f"preemption; advancing to epoch {epoch + 1}"
                )
                continue
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

            val_losses, n = [], 0
            for batch in datamodule.val_dataloader():
                images = mesh_lib.shard_batch(
                    {"image": batch["image"]}, self.mesh
                )["image"]
                val_losses.append(float(val_step(state.params, state.batch_stats, images)))
                n += 1
                if fast_dev_run or n >= config.get("max_val_batches", 200):
                    break
            val_loss = float(np.mean(val_losses)) if val_losses else float("nan")

            epoch_metrics = {
                "train_loss": train_loss,
                "val_loss": val_loss,
                "epoch_time_s": time.time() - t0,
            }
            zs = self._maybe_zeroshot(model, state, text_model, text_vars)
            epoch_metrics.update(zs)
            self._log_metrics(epoch, epoch_metrics, logger_step=int(state.step))
            self.ckpt.save(self._host_state(state), epoch, epoch_metrics)
            print(
                f"epoch {epoch}: kd loss {train_loss:.4f} val {val_loss:.4f} "
                f"({epoch_metrics['epoch_time_s']:.1f}s)"
            )
            if self.args.get("debug"):
                # student must update, frozen teacher must not (FreezeTeacher)
                print(f"  student params hash: {self.param_hash(state.params)}")
            if self._preempt_requested:  # raised during the final step or
                # validation — epoch checkpointed normally (see fit())
                print(
                    f"preempted at the end of epoch {epoch}: checkpoint "
                    f"saved; resume with the same command"
                )
                break
            if fast_dev_run:
                break
        restore_sigterm()
        for lg in self.loggers:
            lg.finalize()
        return state

    def _maybe_zeroshot(self, model, state, text_model, text_vars) -> Dict[str, float]:
        """Per-epoch CLIP zeroshot (ZeroshotEval, trainer.py:1073-1087) on
        whichever eval datasets are locally available."""
        from bcosification_tpu import settings
        from bcosification_tpu.data.datamodules import ClassificationDataModule
        from bcosification_tpu.data.imagenet import imagenet_templates
        from bcosification_tpu.data.presets import (
            CLIPBcosImageNetClassificationPresetEval,
        )
        from bcosification_tpu.training import zeroshot as zs_lib

        results: Dict[str, float] = {}
        # multi-host: gather host-local copies BEFORE any env/data-dependent
        # branch — the gather is a collective every process must join (the
        # _log_explanations pattern); the eval then runs on process-local
        # arrays, so a dataset present on one host only can never leave some
        # hosts inside a global-mesh program others skipped (deadlock)
        if jax.process_count() > 1:
            host_variables = {
                "params": self._host_state(state.params),
                "batch_stats": self._host_state(state.batch_stats),
            }
            if not self._io_process:
                return results
        else:
            host_variables = {
                "params": state.params,
                "batch_stats": state.batch_stats,
            }
        if not settings.DATA_ROOT and not settings.IMAGENET_PATH:
            return results
        try:
            registry = ClassificationDataModule.registry()
            specs = []
            if settings.DATA_ROOT:
                # ZeroshotEval suite (trainer.py:1073-1087): CIFAR-10/100,
                # FashionMNIST, STL-10 — whichever are present under DATA_ROOT
                import os as _os

                candidates = [
                    ("CIFAR10", "cifar-10-batches-py"),
                    ("CIFAR100", "cifar-100-python"),
                    ("FashionMNIST", "FashionMNIST"),
                    ("STL10", "stl10_binary"),
                ]
                for name, subdir in candidates:
                    if name in registry and _os.path.isdir(
                        _os.path.join(settings.DATA_ROOT, subdir)
                    ):
                        specs.append((name, registry[name]))
            if settings.IMAGENET_PATH:
                specs.append(("ImageNet", registry["ImageNet"]))
            variables = host_variables

            # jit once per trainer with variables as an ARGUMENT: a fresh
            # closure per epoch would recompile the full tower every epoch
            # (zeroshot.py r5 review)
            zs_jit = getattr(self, "_zs_encode_jit", None)
            if zs_jit is None:
                zs_jit = jax.jit(
                    lambda v, images: model.apply(
                        v,
                        jnp.concatenate([images, 1.0 - images], axis=-1),
                        train=False,
                    )
                )
                try:
                    self._zs_encode_jit = zs_jit
                except AttributeError:  # unbound test-call pattern
                    pass

            def encode(images):
                return zs_jit(variables, images)

            for name, cls in specs:
                dm = cls(
                    {
                        "batch_size": 64,
                        "num_workers": 8,
                        "train_transform": None,
                        "test_transform": CLIPBcosImageNetClassificationPresetEval(
                            crop_size=224
                        ),
                    }
                )
                dm.setup("test")
                if (
                    name == "ImageNet"
                    and settings.IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH
                ):
                    # precomputed classifier matrix, like the reference's
                    # get_imagenet_zeroshot_weights (trainer.py:47-48,
                    # 1073-1087) — avoids re-encoding 80k prompts per epoch
                    w = zs_lib.load_zeroshot_weights(
                        settings.IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH
                    )
                else:
                    w = zs_lib.zeroshot_classifier(
                        text_model, text_vars, dm.CATEGORIES, imagenet_templates
                    )
                # attn_unpool models score spatial features with the
                # configured cosine power, like the reference's
                # clip_evaluate reading config['model']['cos_power']
                # (ref trainer.py:117-121)
                zcfg = (getattr(self, "config", None) or {}).get("model", {})
                acc = zs_lib.zeroshot_evaluate(
                    encode, dm.test_dataloader(), w,
                    cos_power=(
                        int(zcfg.get("cos_power", 1))
                        if zcfg.get("attn_unpool") else 0
                    ),
                )
                results[f"zeroshot_{name}_acc1"] = acc["acc1"]
        except (FileNotFoundError, NotADirectoryError) as e:
            # ONLY missing-data errors are skippable (like the reference's
            # rank>0 silence); real bugs in the zeroshot path must propagate
            print(f"zeroshot eval skipped (data not present): {e}")
        return results

    def validate(self, eval_step, state, datamodule) -> Dict[str, float]:
        loader = datamodule.val_dataloader()
        totals: Dict[str, float] = {}
        for batch in loader:
            batch = mesh_lib.shard_batch(batch, self.mesh)
            m = eval_step(state, batch)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        count = max(totals.pop("count", 1.0), 1.0)
        out = {
            "val_acc1": totals.get("correct1", 0.0) / count,
            "val_acc5": totals.get("correct5", 0.0) / count,
        }
        if "loss" in totals:
            out["val_loss"] = totals["loss"] / count
        return out

    def _log_explanations(self, model, state, datamodule, epoch, n_images: int = 8):
        """ExplanationsLogger equivalent (explanation_logger.py:59-309): fixed
        val images -> explanation-mode RGBA maps saved under explanations/."""
        from bcosification_tpu.explain.core import make_explain_fn

        # SPMD: the sharded->host gather inside _host_state is a collective
        # EVERY process must join — run it before the io-process-only return
        # (skipping it on non-io processes would deadlock a multi-host pod)
        host_vars = {
            "params": self._host_state(state.params),
            "batch_stats": self._host_state(state.batch_stats),
        }
        if not self._io_process:
            return

        try:
            loader = datamodule.val_dataloader()
            batch = next(iter(loader))
        except Exception:
            return
        x = jnp.asarray(batch["image"][:n_images])
        explain_fn = make_explain_fn(model)
        res = explain_fn(host_vars, x)
        outdir = self.save_dir / "explanations"
        outdir.mkdir(exist_ok=True)
        np.savez_compressed(
            outdir / f"epoch_{epoch}.npz",
            explanation=np.asarray(res["explanation"]),
            contribution_map=np.asarray(res["contribution_map"]),
            prediction=np.asarray(res["prediction"]),
        )
        # render the RGBA explanation grid to PNG (the ExplanationsLogger's
        # W&B/TB figure, explanation_logger.py:184-226, as a file artifact)
        try:
            from PIL import Image

            expl = np.asarray(res["explanation"])  # [N,H,W,4] in [0,1]
            n, h, w, _ = expl.shape
            cols = min(n, 4)
            rows = (n + cols - 1) // cols
            grid = np.zeros((rows * h, cols * w, 4), np.float32)
            for i in range(n):
                r, c = divmod(i, cols)
                grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = expl[i]
            Image.fromarray((grid * 255).astype(np.uint8), "RGBA").save(
                outdir / f"epoch_{epoch}.png"
            )
            for lg in self.loggers:
                lg.log_image("explanations", grid, step=epoch)
        except Exception as e:
            print(f"explanation PNG render skipped: {e}")


def run_training(args) -> None:
    """CLI assembly (training.py:14-89). ``args``: argparse Namespace from
    train.py."""
    from bcosification_tpu.experiments.utils.experiment_utils import Experiment

    if getattr(args, "base_directory", None):
        from bcosification_tpu import settings

        settings.EXPERIMENT_ROOT = args.base_directory
    experiment = Experiment(args.dataset, args.base_network, args.experiment_name)
    seed = experiment.config.get("seed", 42)
    np.random.seed(42 if seed is None else seed)  # 0 is a legitimate seed

    # fold scale-out CLI flags into the trainer config (the reference's
    # put_trainer_args_into_trainer_config pattern, ref trainer.py:915-933)
    tcfg = experiment.config.setdefault("trainer", {})
    if getattr(args, "fsdp", False):
        tcfg["fsdp"] = True
    if int(getattr(args, "model_parallel", 1) or 1) > 1:
        tcfg["model_parallel"] = int(args.model_parallel)
    if int(getattr(args, "pipeline_parallel", 1) or 1) > 1:
        tcfg["pipeline_parallel"] = int(args.pipeline_parallel)

    model, variables = experiment.get_model()
    datamodule = experiment.get_datamodule(
        cache_dataset=getattr(args, "cache_dataset", None)
    )
    trainer = Trainer(experiment, vars(args))
    trainer.fit(
        model,
        variables,
        datamodule,
        fast_dev_run=getattr(args, "fast_dev_run", False),
        explanation_logging=getattr(args, "explanation_logging", False),
        explanation_logging_every_n_epochs=getattr(
            args, "explanation_logging_every_n_epochs", 1
        ),
        resume=getattr(args, "resume", True),
    )


"""Checkpointing: Orbax persistence of the TrainState with the reference's
selection semantics.

Parity target: PL ModelCheckpoint wiring (save_last + top-3 by monitored
metric + EMA-monitor twin, `/root/reference/bcos/training/trainer.py:974-1017`)
and the reload resolution (last / best / best_any / epoch_N, +-ema,
`/root/reference/bcos/experiments/utils/experiment_utils/loading_utils.py`).

Layout: <save_dir>/checkpoints/epoch_<N>/ (orbax trees) + index.json with
per-epoch metrics; pruning keeps the last checkpoint plus the top-k by the
monitor and top-k by its EMA twin.
"""
from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(
        self,
        save_dir: str,
        monitor: str = "val_acc1",
        mode: str = "max",
        top_k: int = 3,
    ):
        self.save_dir = Path(save_dir)
        self.ckpt_dir = self.save_dir / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self._index_path = self.ckpt_dir / "index.json"
        # PROCESS-LOCAL orbax scope: by default orbax's save/restore are
        # collective over every jax process (sync_global_devices barriers),
        # so a rank-0-only save deadlocks a real process group and a shared
        # checkpointer can't restore on non-primary ranks. Scoping each
        # rank's checkpointer to itself makes every orbax barrier a local
        # no-op; OUR write discipline (is_main_process guard in save) is the
        # only coordination, validated end-to-end by
        # tests/test_real_distributed.py.
        self._checkpointer = None
        if ocp:
            mp_opts = ocp.options.MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()},
            )
            self._checkpointer = ocp.StandardCheckpointer(
                multiprocessing_options=mp_opts
            )

    # -- index ------------------------------------------------------------------
    def _load_index(self) -> Dict[str, Any]:
        if self._index_path.exists():
            with open(self._index_path) as f:
                return json.load(f)
        return {"epochs": {}}

    def _save_index(self, index):
        # atomic: the preemption path saves while the platform is about to
        # hard-kill the process — a SIGKILL mid-json.dump must never leave a
        # truncated index.json that makes every future resume crash
        # (r5 review)
        tmp = self._index_path.with_name(f"{self._index_path.name}.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            json.dump(index, f, indent=1)
        os.replace(tmp, self._index_path)

    # -- save ---------------------------------------------------------------------
    def save(self, state, epoch: int, metrics: Optional[Dict[str, float]] = None):
        from bcosification_tpu.parallel.mesh import is_main_process

        assert self._checkpointer is not None, "orbax not available"
        if is_main_process():
            # process 0 writes everything: the state every rank passes in is
            # identical (Trainer._host_state gathers it collectively), and
            # concurrent writers would corrupt index.json / the orbax tree.
            # The checkpointer is process-local (see __init__) so this write
            # involves no cross-process orbax barrier.
            path = (self.ckpt_dir / f"epoch_{epoch}").absolute()
            self._checkpointer.save(path, state, force=True)
            self._checkpointer.wait_until_finished()
            index = self._load_index()
            index["epochs"][str(epoch)] = {
                "metrics": {k: float(v) for k, v in (metrics or {}).items()},
            }
            index["last"] = epoch
            self._prune(index)  # prunes AND persists the index (one write)
        if jax.process_count() > 1:
            # barrier: without it a non-writing rank can run ahead into a
            # subsequent restore("last") while process 0 is still writing,
            # and the ranks would resume from different epochs
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"bcos_ckpt_save_{epoch}")

    def _score(self, entry, monitor):
        v = entry["metrics"].get(monitor)
        if v is None:
            return None
        return v if self.mode == "max" else -v

    def _prune(self, index):
        epochs = index["epochs"]
        keep = {index.get("last")}
        for mon in (self.monitor, f"{self.monitor}_ema"):
            scored = []
            for ep, e in epochs.items():
                score = self._score(e, mon)
                if score is not None:
                    scored.append((score, int(ep)))
            scored.sort(reverse=True)
            keep.update(ep for _, ep in scored[: self.top_k])
        doomed = [ep for ep in list(epochs) if int(ep) not in keep]
        for ep in doomed:
            del epochs[ep]
        # persist the index BEFORE deleting directories: a crash between the
        # two must leave dangling DIRECTORIES (harmless, re-pruned later),
        # never dangling index ENTRIES whose restore would FileNotFoundError
        # (r5 review)
        self._save_index(index)
        for ep in doomed:
            p = self.ckpt_dir / f"epoch_{ep}"
            if p.exists():
                shutil.rmtree(p)

    # -- load ---------------------------------------------------------------------
    def available_checkpoints(self) -> List[int]:
        return sorted(int(e) for e in self._load_index()["epochs"])

    def epoch_metrics(self, epoch: int) -> Dict[str, float]:
        """Metrics recorded with a saved epoch (e.g. the preemption markers
        `preempted`/`steps_into_epoch` the fit loops use for exact mid-epoch
        resume). Empty dict if the epoch is unknown."""
        entry = self._load_index()["epochs"].get(str(epoch))
        return dict(entry["metrics"]) if entry else {}

    def resolve(self, reload: str = "last") -> Optional[int]:
        """last | best | best_any | epoch_N -> epoch number (None if nothing)."""
        index = self._load_index()
        epochs = index["epochs"]
        if not epochs:
            return None
        if reload == "last":
            return index.get("last", max(int(e) for e in epochs))
        if reload.startswith("epoch_"):
            n = int(reload.split("_", 1)[1])
            return n if str(n) in epochs else None
        if reload in ("best", "best_any"):
            monitors = [self.monitor]
            if reload == "best_any":
                monitors.append(f"{self.monitor}_ema")
            best = None
            for mon in monitors:
                for ep, e in epochs.items():
                    s = self._score(e, mon)
                    if s is not None and (best is None or s > best[0]):
                        best = (s, int(ep))
            return best[1] if best else index.get("last")
        raise ValueError(f"unknown reload spec {reload!r}")

    def restore(self, state_template, reload: str = "last"):
        """Restore into the shape of state_template. Returns (state, epoch) or
        (None, None) if no checkpoint exists."""
        assert self._checkpointer is not None, "orbax not available"
        epoch = self.resolve(reload)
        if epoch is None:
            return None, None
        path = (self.ckpt_dir / f"epoch_{epoch}").absolute()
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
            if not hasattr(x, "shape") or not hasattr(x, "dtype")
            else jax.ShapeDtypeStruct(x.shape, x.dtype),
            state_template,
        )
        state = self._checkpointer.restore(path, abstract)
        return state, epoch

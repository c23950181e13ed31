"""The `Experiment` handle — the universal entry to configs, models, data and
trained checkpoints.

Parity target: `/root/reference/bcos/experiments/utils/experiment_utils/
experiment_utils.py:27-324` (+ loading_utils / metric_utils): resolves
(dataset, base_network, experiment_name) or a path to (config, model factory);
exposes get_model / get_datamodule / load_trained_model
(reload=last/best/best_any/epoch_N, +-ema) / available_checkpoints /
load_metrics.
"""
from __future__ import annotations

import gzip
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

from bcosification_tpu import settings
from bcosification_tpu.experiments.utils.config_utils import (
    get_configs_and_model_factory,
)

__all__ = ["Experiment"]


class Experiment:
    def __init__(
        self,
        dataset: str = None,
        base_network: str = None,
        experiment_name: str = None,
        path: Optional[str] = None,
    ):
        if path is not None:
            parts = Path(path).parts
            # .../<dataset>/<base_network>/<experiment_name>
            dataset, base_network, experiment_name = parts[-3], parts[-2], parts[-1]
        assert dataset and base_network and experiment_name
        self.dataset = dataset
        self.base_network = base_network
        self.experiment_name = experiment_name

        configs, get_model = get_configs_and_model_factory(dataset, base_network)
        if experiment_name not in configs:
            raise ValueError(
                f"No config '{experiment_name}' in {dataset}/{base_network}. "
                f"Available: {sorted(configs)[:20]}"
            )
        self.config: Dict[str, Any] = configs[experiment_name]
        self._get_model = get_model

    # -- paths ----------------------------------------------------------------
    @property
    def save_dir(self) -> Path:
        return (
            Path(settings.EXPERIMENT_ROOT)
            / self.dataset
            / self.base_network
            / self.experiment_name
        )

    # -- model ----------------------------------------------------------------
    @property
    def model_config(self) -> Dict[str, Any]:
        return self.config["model"]

    def get_model(self):
        """-> (linen model, variables) at conversion-time init."""
        return self._get_model(self.model_config)

    # -- data -----------------------------------------------------------------
    def get_datamodule(self, cache_dataset: Optional[str] = None, **data_overrides):
        """Build the registered datamodule for this experiment's dataset.

        ``data_overrides`` update the data config (e.g. ``test_transform`` for
        the localisation analyser's rescale mode — reference
        `localisation.py:256-265` passes data_config_overrides the same way).
        """
        from bcosification_tpu.data.datamodules import ClassificationDataModule

        registry = ClassificationDataModule.registry()
        cls = registry[self.dataset]
        cfg = dict(self.config["data"])
        if cache_dataset:
            cfg["cache_dataset"] = cache_dataset
        cfg.update(data_overrides)
        return cls(cfg)

    # -- checkpoints ------------------------------------------------------------
    def _ckpt_manager(self):
        from bcosification_tpu.training.checkpointing import CheckpointManager

        monitor = "val_loss" if self._is_clip_kd() else "val_acc1"
        mode = "min" if monitor == "val_loss" else "max"
        return CheckpointManager(str(self.save_dir), monitor=monitor, mode=mode)

    def _is_clip_kd(self) -> bool:
        margs = self.config.get("model", {}).get("bcosify_args", {}) or {}
        return bool(margs.get("clip_kd", False))

    def available_checkpoints(self):
        return self._ckpt_manager().available_checkpoints()

    def load_trained_model(
        self, reload: str = "last", ema: bool = False, verbose: bool = True,
        strict_ema: bool = False,
    ):
        """-> (model, variables) with trained weights. ``ema`` selects the EMA
        weights from the train state (loading_utils.py:80-100 prefix logic);
        when the state carries no EMA the plain weights are returned like the
        reference's fallback — pass ``strict_ema=True`` to raise instead
        (release tooling must not mislabel plain weights as EMA)."""
        from bcosification_tpu.training.trainer import build_train_state_template

        model, variables = self.get_model()
        mgr = self._ckpt_manager()
        template = build_train_state_template(self, model, variables)
        state, epoch = mgr.restore(template, reload)
        if state is None:
            raise FileNotFoundError(
                f"No checkpoint for {self.save_dir} (reload={reload})"
            )
        if verbose:
            print(f"Loaded epoch {epoch} from {self.save_dir} (ema={ema})")
        if ema and strict_ema and state.ema_params is None:
            raise ValueError(
                f"EMA weights requested but the checkpoint at {self.save_dir} "
                "carries no EMA state (trained without ema_decay)"
            )
        params = state.ema_params if (ema and state.ema_params is not None) else state.params
        bs = (
            state.ema_batch_stats
            if (ema and state.ema_batch_stats is not None)
            else state.batch_stats
        )
        return model, {"params": params, "batch_stats": bs}

    # -- metrics ------------------------------------------------------------------
    def load_metrics(self) -> Dict[str, Any]:
        path = self.save_dir / "metrics" / "metrics.json.gz"
        if not path.exists():
            return {}
        with gzip.open(path, "rt") as f:
            return json.load(f)

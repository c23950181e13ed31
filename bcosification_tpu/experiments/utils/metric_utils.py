"""Metrics history helper.

Parity target: `/root/reference/bcos/experiments/utils/experiment_utils/
metric_utils.py`: a dict-like `Metrics` loaded from the persisted history with
best-epoch search (:83-150). Multilabel AP lives in
`clip_benchmark/metrics/zeroshot_classification.average_precision`.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

__all__ = ["Metrics"]


class Metrics(dict):
    """{name: [(epoch, value), ...]} with best-epoch lookup."""

    @classmethod
    def load(cls, experiment) -> "Metrics":
        return cls(experiment.load_metrics())

    def series(self, name: str) -> Tuple[List[int], List[float]]:
        entries = self.get(name, [])
        return [int(e) for e, _ in entries], [float(v) for _, v in entries]

    def best_epoch(self, name: str = "val_acc1", mode: str = "max") -> Optional[int]:
        entries = self.get(name)
        if not entries:
            return None
        key = (lambda t: t[1]) if mode == "max" else (lambda t: -t[1])
        return int(max(entries, key=key)[0])

    def best_value(self, name: str = "val_acc1", mode: str = "max") -> Optional[float]:
        entries = self.get(name)
        if not entries:
            return None
        vals = [v for _, v in entries]
        return max(vals) if mode == "max" else min(vals)

    def last(self, name: str) -> Optional[float]:
        entries = self.get(name)
        return float(entries[-1][1]) if entries else None

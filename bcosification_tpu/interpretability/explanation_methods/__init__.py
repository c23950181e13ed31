"""Explainer registry.

Parity target: `/root/reference/interpretability/explanation_methods/
explainers/__init__.py:62-104` (graceful registry) and the per-explainer
config dicts (`explanation_configs.py:5-30`).
"""
from __future__ import annotations

from typing import Any, Dict

from bcosification_tpu.interpretability.explanation_methods.explainers import (
    GB,
    DeepLift,
    ExplainerBase,
    Grad,
    GradCam,
    IntGrad,
    IxG,
    Lime,
    Occlusion,
    Ours,
    OursRelative,
    Rise,
)

__all__ = ["explainer_map", "explanation_configs", "get_explainer"]

explainer_map = {
    "Ours": Ours,
    "OursRelative": OursRelative,
    "IxG": IxG,
    "Grad": Grad,
    "GB": GB,
    "DeepLIFT": DeepLift,
    "DeepLift": DeepLift,
    "IntGrad": IntGrad,
    "GradCam": GradCam,
    "Occlusion": Occlusion,
    "Rise": Rise,
    "RISE": Rise,
    "Lime": Lime,
    "LIME": Lime,
}

# explanation_configs.py:5-30
explanation_configs: Dict[str, Dict[str, Any]] = {
    "Ours": {},
    "OursRelative": {},
    "IxG": {},
    "Grad": {},
    "GB": {},
    "DeepLIFT": {},
    "IntGrad": {"n_steps": 20},
    "GradCam": {},
    "Occlusion": {"patch_size": 16, "stride": 8},
    "Rise": {"n_masks": 500, "cell_size": 7, "p": 0.5},
    "Lime": {"n_samples": 200, "cell_size": 8},
}


def get_explainer(model, variables, explainer_name: str, **overrides) -> ExplainerBase:
    if explainer_name not in explainer_map:
        raise ValueError(
            f"Unknown explainer {explainer_name!r}. Available: {sorted(explainer_map)}"
        )
    cfg = dict(explanation_configs.get(explainer_name, {}))
    cfg.update(overrides)
    return explainer_map[explainer_name](model, variables, **cfg)

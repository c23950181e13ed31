"""Model factory for ImageNet/bcosification.

Parity target: `/root/reference/bcos/experiments/ImageNet/bcosification/
model.py:15-57`: build the GAP-reordered torchvision arch, load pretrained
weights, wrap in BcosifyNetwork (add_channels + logit layer), apply
standard_changes (maxpool->AvgPool2d) and null the biases — all of which are
performed by `bcosify.engine.build_bcosified_*` here.

Pretrained torchvision checkpoints are resolved offline from
$TORCHVISION_WEIGHTS_DIR/<arch>.{pth,npz} (no network egress on TPU pods).
"""
from __future__ import annotations

import os
import warnings
from pathlib import Path

import numpy as np

from bcosification_tpu.bcosify.engine import (
    build_bcosified_densenet,
    build_bcosified_resnet,
)

__all__ = ["get_model", "load_torchvision_state_dict"]


def load_torchvision_state_dict(arch_name: str, weights_spec):
    """Resolve a torchvision checkpoint from $TORCHVISION_WEIGHTS_DIR.

    Accepts <arch>.pth (torch pickles, loaded CPU-side) or <arch>.npz.
    Returns None (random init) when weights_spec is None or the file is
    missing (with a warning — the reference downloads from torchvision hub,
    which is unavailable offline).
    """
    if not weights_spec:
        return None
    root = os.getenv("TORCHVISION_WEIGHTS_DIR")
    if not root:
        warnings.warn(
            f"TORCHVISION_WEIGHTS_DIR not set; '{arch_name}' will be randomly "
            "initialised instead of using pretrained weights."
        )
        return None
    for ext in (".pth", ".pt", ".npz"):
        path = Path(root) / f"{arch_name}{ext}"
        if path.exists():
            if ext == ".npz":
                return dict(np.load(path))
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            return sd
    warnings.warn(f"No checkpoint for '{arch_name}' under {root}; random init.")
    return None


def get_model(model_config):
    """-> (model, variables)."""
    assert model_config.get("is_bcos", False), "Should be true!"
    arch_name = model_config["name"]
    state_dict = load_torchvision_state_dict(arch_name, model_config.get("weights"))
    num_classes = model_config.get("args", {}).get("num_classes", 1000)
    if arch_name.startswith("resnet"):
        return build_bcosified_resnet(
            model_config, state_dict, num_classes=num_classes
        )
    if arch_name.startswith("densenet"):
        return build_bcosified_densenet(
            model_config, state_dict, num_classes=num_classes
        )
    raise ValueError(f"unsupported arch {arch_name!r}")

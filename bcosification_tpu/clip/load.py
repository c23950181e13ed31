"""clip.load equivalent — build (CLIP model, variables) from an OpenAI
checkpoint file resolved offline.

Parity target: `/root/reference/CLIP/clip/clip.py:94` (the fork adds
``pretrained: bool`` so an architecture can be built WITHOUT loading weights)
and `build_model` (`CLIP/clip/model.py:400-438`). Checkpoints resolve from
$CLIP_WEIGHTS_PATH (a file) or $CLIP_WEIGHTS_DIR/<name>.pt — OpenAI ships
torchscript archives; `torch.jit.load(...).state_dict()` extracts the tensors
(fp16 -> fp32, `.float()` in `clip_bcosification/model.py:12`).
"""
from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from bcosification_tpu.clip import model as clip_model
from bcosification_tpu.clip.tokenizer import tokenize  # noqa: F401  (re-export)

__all__ = ["available_models", "load_state_dict_file", "load", "tokenize"]

_MODELS = ["RN50", "RN101", "RN50x4", "RN50x16", "RN50x64", "ViT-B/32", "ViT-B/16", "ViT-L/14"]

# framework model-config names -> OpenAI CLIP tower names (shared by the
# experiment factories and the KD trainer's teacher selection)
MODEL_CONFIG_CLIP_NAMES = {
    "resnet50clip": "RN50",
    "vitb32clip": "ViT-B/32",
    "vitb16clip": "ViT-B/16",
    "vitl14clip": "ViT-L/14",
}


def available_models():
    return list(_MODELS)


def load_state_dict_file(name: str = "RN50") -> Optional[Dict[str, np.ndarray]]:
    """Resolve + load an OpenAI CLIP checkpoint into {key: np.float32 array}."""
    candidates = []
    if os.getenv("CLIP_WEIGHTS_PATH"):
        candidates.append(Path(os.environ["CLIP_WEIGHTS_PATH"]))
    if os.getenv("CLIP_WEIGHTS_DIR"):
        for ext in (".pt", ".pth", ".npz"):
            candidates.append(
                Path(os.environ["CLIP_WEIGHTS_DIR"]) / f"{name.replace('/', '-')}{ext}"
            )
    path = next((p for p in candidates if p.exists()), None)
    if path is None:
        warnings.warn(
            f"No CLIP checkpoint for {name!r} (set CLIP_WEIGHTS_PATH or "
            "CLIP_WEIGHTS_DIR); using random init."
        )
        return None
    if path.suffix == ".npz":
        return {k: np.asarray(v, np.float32) for k, v in np.load(path).items()}
    import torch

    try:
        model = torch.jit.load(str(path), map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(str(path), map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if k in ("input_resolution", "context_length", "vocab_size"):
            continue
        arr = v.float().numpy() if hasattr(v, "float") else np.asarray(v, np.float32)
        out[k] = arr
    return out


def load(name: str = "RN50", pretrained: bool = True):
    """-> (visual_model, visual_vars, text_model, text_vars, logit_scale, cfg).

    Supports both ModifiedResNet (RN50-family) and ViT image towers; the
    reference's B-cosification targets RN50, ViT bcosification is this
    framework's extension (bcosify/clip_import.build_bcosified_clip_vit_visual).
    """
    from bcosification_tpu.bcosify.clip_import import (
        build_clip_teacher_visual,
        build_clip_text,
    )

    sd = load_state_dict_file(name) if pretrained else None
    if sd is not None:
        cfg = clip_model.config_from_state_dict(sd)
    elif name.startswith("ViT"):
        cfg = clip_model.clip_vit_config(name)
    else:
        cfg = clip_model.clip_rn50_config()
    visual, visual_vars = build_clip_teacher_visual(sd, cfg)
    text, text_vars = build_clip_text(sd, cfg)
    logit_scale = (
        float(np.exp(sd["logit_scale"])) if sd is not None else float(1 / 0.07)
    )
    return visual, visual_vars, text, text_vars, logit_scale, cfg

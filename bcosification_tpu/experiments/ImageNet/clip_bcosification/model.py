"""Model factory for ImageNet/clip_bcosification.

Parity target: `/root/reference/bcos/experiments/ImageNet/clip_bcosification/
model.py:8-25`: clip.load("RN50") -> float32 -> BcosifyNetwork(model.visual)
with biases and the attnpool positional embedding nulled.
"""
from __future__ import annotations

from bcosification_tpu.bcosify.clip_import import build_bcosified_clip_visual
from bcosification_tpu.clip.load import load_state_dict_file

__all__ = ["get_model"]


def get_model(model_config):
    assert model_config.get("is_bcos", False), "Should be true!"
    sd = load_state_dict_file("RN50")
    return build_bcosified_clip_visual(model_config, sd)

"""Model factory for ImageNet/clip_bcosification.

Parity target: `/root/reference/bcos/experiments/ImageNet/clip_bcosification/
model.py:8-25`: clip.load("RN50") -> float32 -> BcosifyNetwork(model.visual)
with biases and the attnpool positional embedding nulled.

BEYOND-REFERENCE: ``model.name`` also accepts the CLIP ViT towers
(vitb32clip / vitb16clip / vitl14clip), dispatched to the ViT conversion
recipe (bcosify/clip_import.build_bcosified_clip_vit_visual).
"""
from __future__ import annotations

from bcosification_tpu.bcosify.clip_import import (
    build_bcosified_clip_visual,
    build_bcosified_clip_vit_visual,
)
from bcosification_tpu.clip import model as clip_model
from bcosification_tpu.clip.load import (
    MODEL_CONFIG_CLIP_NAMES as _CLIP_NAMES,
    load_state_dict_file,
)

__all__ = ["get_model"]


def get_model(model_config):
    assert model_config.get("is_bcos", False), "Should be true!"
    name = model_config.get("name", "resnet50clip")
    clip_name = _CLIP_NAMES[name]
    sd = load_state_dict_file(clip_name)
    if name.startswith("vit"):
        cfg = (
            clip_model.config_from_state_dict(sd)
            if sd is not None
            else clip_model.clip_vit_config(clip_name)
        )
        return build_bcosified_clip_vit_visual(model_config, sd, cfg)
    return build_bcosified_clip_visual(model_config, sd)

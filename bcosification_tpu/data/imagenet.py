"""OpenAI CLIP ImageNet zero-shot prompt data (80 templates + 1000 class
names), loaded from the bundled public asset.

Parity target: `/root/reference/bcos/data/imagenet.py:1-86`.
"""
import json
from pathlib import Path

with open(Path(__file__).parent / "assets" / "clip_imagenet_prompts.json") as f:
    _data = json.load(f)

imagenet_templates = _data["templates"]
imagenet_classes = _data["classnames"]

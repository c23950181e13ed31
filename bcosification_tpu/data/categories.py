"""Category name lists (loaded from bundled public metadata assets).

Parity target: `/root/reference/bcos/data/categories.py` (data, not code).
"""
import json
from pathlib import Path

_ASSETS = Path(__file__).parent / "assets"

with open(_ASSETS / "categories.json") as f:
    _cats = json.load(f)

IMAGENET_CATEGORIES = _cats["IMAGENET_CATEGORIES"]
CIFAR10_CATEGORIES = _cats["CIFAR10_CATEGORIES"]

VOC_CATEGORIES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def imagenet_class_index():
    with open(_ASSETS / "imagenet_class_index.json") as f:
        return json.load(f)

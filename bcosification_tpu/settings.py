"""General settings — env-var configured paths.

Parity target: `/root/reference/bcos/settings.py:1-24`. The SHM/Redis caching
knobs are replaced by a local-cache dir (TPU VMs have fast local SSD; the
reference's Redis/SHM machinery targeted network-filesystem GPU clusters).
"""
import os

# data root (mainly for CIFAR10)
DATA_ROOT = os.getenv("DATA_ROOT")

# ImageNet path (ImageFolder layout: train/ and val/ class dirs)
IMAGENET_PATH = os.getenv("IMAGENET_PATH")
IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH = os.getenv("IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH")

# VOC path
VOC_PATH = os.getenv("VOC_PATH")

# CC3M path (webdataset shards {00000..00331}.tar)
CC3M_PATH = os.getenv("CC3M_PATH")

# local dataset cache (replaces the reference's /dev/shm + Redis machinery)
LOCAL_CACHE_DIR = os.getenv("BCOS_CACHE_DIR", os.path.expanduser("~/.cache/bcos_tpu"))

# checkpoint/experiment output root
EXPERIMENT_ROOT = os.getenv("BCOS_EXPERIMENT_ROOT", "./experiments")

# OpenAI CLIP checkpoints / BPE vocab
CLIP_WEIGHTS_PATH = os.getenv("CLIP_WEIGHTS_PATH")
CLIP_BPE_PATH = os.getenv("CLIP_BPE_PATH")

# B-cos-v2 hub checkpoints dir (for vit_bcosification)
BCOS_HUB_PATH = os.getenv("BCOS_HUB_PATH")

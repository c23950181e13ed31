"""Adapters wrapping external TORCH CLIP models (rinna japanese-clip,
open_clip incl. NLLB-CLIP) into the benchmark's ModelBundle interface.

The rest of the pipeline is JAX/numpy with NHWC images; these helpers convert
at the boundary: the external package's PIL transform is wrapped to emit
numpy HWC float32, and the encoders take numpy NHWC and return numpy
features. Bundles are marked ``jittable=False`` so metrics call them eagerly.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = ["wrap_torch_transform", "to_torch_nchw", "make_torch_bundle"]


def wrap_torch_transform(transform) -> Callable:
    """PIL -> numpy HWC float32, via the external package's own transform
    (which emits torch CHW tensors)."""

    def apply(img):
        out = transform(img)
        arr = out.detach().cpu().numpy() if hasattr(out, "detach") else np.asarray(out)
        if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
            arr = arr.transpose(1, 2, 0)  # CHW -> HWC
        return np.asarray(arr, np.float32)

    return apply


def to_torch_nchw(images, device):
    import torch

    arr = np.asarray(images, np.float32)
    t = torch.from_numpy(arr)
    if t.ndim == 4 and t.shape[-1] in (1, 3, 6):  # NHWC -> NCHW
        t = t.permute(0, 3, 1, 2).contiguous()
    return t.to(device)


def make_torch_bundle(encode_image_np, encode_texts_np, tokenizer):
    """ModelBundle over numpy-in/numpy-out torch encoders."""
    from clip_benchmark.models import ModelBundle

    return ModelBundle(
        encode_image=encode_image_np,
        text_model=None,
        text_vars=None,
        tokenizer=tokenizer,
        encode_texts_fn=encode_texts_np,
        jittable=False,
    )

"""clip.load equivalent — build (CLIP model, variables) from an OpenAI
checkpoint file resolved offline, or fetched egress-gated.

Parity target: `/root/reference/CLIP/clip/clip.py:94` (the fork adds
``pretrained: bool`` so an architecture can be built WITHOUT loading weights)
and `build_model` (`CLIP/clip/model.py:400-438`). Checkpoints resolve from
$CLIP_WEIGHTS_PATH (a file) or $CLIP_WEIGHTS_DIR/<name>.pt — OpenAI ships
torchscript archives; `torch.jit.load(...).state_dict()` extracts the tensors
(fp16 -> fp32, `.float()` in `clip_bcosification/model.py:12`).

Where the reference's `clip.load` downloads the weights at call time
(`CLIP/clip/clip.py:30-40` URL table + `_download` sha256 check), this
module fetches only behind the same egress gate as the released B-cos
weights (BCOS_ALLOW_DOWNLOAD=1, models/pretrained._maybe_fetch_npz):
zero-egress behaviour is unchanged, and on an egress-capable host the
CLIP-KD recipe needs no manual weight drop.
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

# OpenAI's public release URLs (the URL's second-to-last path component is
# the checkpoint's sha256 — the reference verifies it in `_download`,
# CLIP/clip/clip.py:43-70; public data, the table IS the spec)
_MODEL_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def _cache_root() -> Path:
    return Path(
        os.getenv("CLIP_WEIGHTS_DIR")
        or Path.home() / ".cache" / "bcosification_tpu" / "clip"
    )


def _maybe_fetch_checkpoint(name: str) -> Optional[Path]:
    """Egress-gated OpenAI teacher-weight fetch (BCOS_ALLOW_DOWNLOAD=1,
    mirroring models/pretrained._maybe_fetch_npz; download/verify logic
    shared with models/pretrained.fetch_checkpoint). Downloads to
    $CLIP_WEIGHTS_DIR (or ~/.cache/bcosification_tpu/clip), sha256-verified
    against the URL path component exactly as the reference's `_download`
    does (CLIP/clip/clip.py:47). Returns None (-> random init + warning)
    when the gate is off, the name is unknown, or the fetch/verify fails —
    zero-egress behaviour is byte-identical to before. Cache HITS are not
    gated: load_state_dict_file finds previously-downloaded files among its
    local candidates before this function is ever called."""
    if os.getenv("BCOS_ALLOW_DOWNLOAD", "0") != "1":
        return None
    url = _MODEL_URLS.get(name)
    if url is None:
        return None
    from bcosification_tpu.models.pretrained import fetch_checkpoint

    dest = _cache_root() / f"{name.replace('/', '-')}.pt"
    expected = url.split("/")[-2]
    is_sha = len(expected) == 64 and all(c in "0123456789abcdef" for c in expected)
    # no local "not integrity-checked" warn: fetch_checkpoint emits exactly
    # one when expected_sha is None and the filename carries no hash either
    try:
        return fetch_checkpoint(
            url, dest, timeout=300.0, expected_sha=expected if is_sha else None
        )
    except Exception as e:  # noqa: BLE001 — network errors degrade to random init
        warnings.warn(f"CLIP checkpoint download of {url} failed: {e}")
        return None

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


def _read_state_dict(path: Path) -> Dict[str, np.ndarray]:
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
    # the default download cache is an ordinary local candidate — reading a
    # previously-fetched file is not egress, so it must work WITHOUT
    # BCOS_ALLOW_DOWNLOAD (r5 review #3: the cache hit used to sit behind
    # the gate, silently degrading a cached teacher to random init)
    default_cache = (
        Path.home() / ".cache" / "bcosification_tpu" / "clip"
        / f"{name.replace('/', '-')}.pt"
    )
    candidates.append(default_cache)
    path = next((p for p in candidates if p.exists()), None)
    if path == default_cache:
        # OUR cache file: verify bytes against the published sha before use,
        # exactly as the reference's _download re-verifies its cache
        # (CLIP/clip/clip.py:47-52). Hashing is local — no egress, no gate.
        # User-supplied candidates are trusted as-is (they may legitimately
        # differ from the OpenAI release).
        url = _MODEL_URLS.get(name, "")
        expected = url.split("/")[-2] if "/" in url else ""
        if (
            len(expected) == 64
            and all(c in "0123456789abcdef" for c in expected)
        ):
            from bcosification_tpu.models.pretrained import _sha256_file

            if _sha256_file(path) != expected:
                warnings.warn(
                    f"{path} fails its sha256 check; attempting a verified "
                    "re-download"
                )
                path = _maybe_fetch_checkpoint(name)
                if path is None:
                    warnings.warn(
                        f"cannot re-fetch {name!r} (gate off or fetch "
                        "failed); using random init"
                    )
                    return None
    if path is None:
        path = _maybe_fetch_checkpoint(name)
    if path is None:
        warnings.warn(
            f"No CLIP checkpoint for {name!r} (set CLIP_WEIGHTS_PATH or "
            "CLIP_WEIGHTS_DIR, or BCOS_ALLOW_DOWNLOAD=1 on an egress-capable "
            "host); using random init."
        )
        return None
    try:
        return _read_state_dict(path)
    except Exception as e:  # noqa: BLE001 — only self-heal OUR cache file
        if path != default_cache:
            # user-supplied paths fail loudly: silently serving a random-init
            # teacher after a typo'd/corrupt CLIP_WEIGHTS_PATH would be worse
            raise
        warnings.warn(
            f"cached CLIP checkpoint {path} is unreadable "
            f"({type(e).__name__}: {e}); attempting a verified re-download"
        )
        refreshed = _maybe_fetch_checkpoint(name)  # sha-verified, replaces dest
        if refreshed is not None:
            try:
                return _read_state_dict(refreshed)
            except Exception as e2:  # noqa: BLE001
                warnings.warn(
                    f"re-fetched checkpoint is also unreadable "
                    f"({type(e2).__name__}: {e2}); using random init"
                )
                return None
        warnings.warn(
            f"cannot re-fetch {name!r} (gate off or fetch failed); "
            "using random init"
        )
        return None


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

"""ctypes bindings for the native C++ data loader (native/bcos_loader.cpp).

The native runtime fuses JPEG decode (libjpeg) + resize/crop/flip + the
AddInverse 6-channel encode in a C++ thread pool, replacing the reference's
torch DataLoader workers and SHM/Redis caching machinery
(`/root/reference/bcos/data/caching/`). Falls back gracefully when the shared
library has not been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "native_available",
    "NativeImageLoader",
    "decode_resize",
    "decode_transform_bytes",
]

_LIB_PATHS = [
    Path(__file__).parents[2] / "native" / "libbcos_loader.so",
    Path(os.getenv("BCOS_NATIVE_LIB", "/nonexistent")),
]

# Must match bcos_loader_abi_version() in native/bcos_loader.cpp. A stale
# binary (the .so is checked in; a fresh checkout equalises mtimes, so make
# cannot detect it) is rejected rather than silently misbehaving.
_ABI_VERSION = 6

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            try:
                lib.bcos_loader_abi_version.restype = ctypes.c_int
                version = lib.bcos_loader_abi_version()
            except AttributeError:
                version = -1
            if version != _ABI_VERSION:
                import warnings

                warnings.warn(
                    f"native loader {p} has ABI version {version}, expected "
                    f"{_ABI_VERSION}; rebuild with `make -B -C native`. "
                    "Falling back to the Python loader path."
                )
                continue
            lib.bcos_loader_create.restype = ctypes.c_void_p
            lib.bcos_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_uint64,
                ctypes.c_int,
            ]
            lib.bcos_loader_next.restype = ctypes.c_int
            lib.bcos_loader_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.bcos_loader_n_batches.restype = ctypes.c_int
            lib.bcos_loader_n_batches.argtypes = [ctypes.c_void_p]
            lib.bcos_loader_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.bcos_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.bcos_decode_resize.restype = ctypes.c_int
            lib.bcos_decode_resize.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.bcos_decode_transform_mem.restype = ctypes.c_int
            lib.bcos_decode_transform_mem.argtypes = [
                ctypes.c_char_p,  # raw bytes
                ctypes.c_longlong,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
            return lib
    return None


def native_available() -> bool:
    return _load_lib() is not None


def decode_resize(
    path: str, out_size: int = 224, resize_size: int = 256, channels: int = 6
) -> Optional[np.ndarray]:
    """Single-image eval transform: resize shorter side + center crop +
    AddInverse, returns [out_size, out_size, channels] float32."""
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, channels), np.float32)
    ok = lib.bcos_decode_resize(
        path.encode(),
        out_size,
        resize_size,
        channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if ok else None


def decode_transform_bytes(
    data: bytes,
    *,
    out_size: int = 224,
    resize_size: int = 256,
    channels: int = 3,
    train: bool = False,
    seed: int = 0,
) -> Optional[np.ndarray]:
    """In-memory JPEG decode + fused transform (the webdataset hot path).

    eval: resize shorter side + center crop; train: RandomResizedCrop + hflip
    driven by ``seed`` (pass a distinct per-sample seed for reproducible
    epochs). ctypes releases the GIL for the call, so a Python thread pool
    scales it across cores. Returns None when the native library is missing
    or the buffer is not a decodable JPEG (caller falls back to PIL)."""
    if channels not in (3, 6):
        raise ValueError(f"channels must be 3 or 6, got {channels}")
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, channels), np.float32)
    ok = lib.bcos_decode_transform_mem(
        data,
        len(data),
        out_size,
        resize_size,
        channels,
        1 if train else 0,
        seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if ok else None


class NativeImageLoader:
    """Batched iterator over (paths, labels) backed by the C++ thread pool.

    mode: 'eval' (resize+center-crop) | 'train' (random-resized-crop + flip).
    Yields {'image': [B,S,S,C] float32, 'label': [B] int32}.
    """

    def __init__(
        self,
        paths: Sequence[str],
        labels: Sequence[int],
        *,
        out_size: int = 224,
        resize_size: int = 256,
        batch_size: int = 64,
        num_threads: int = 16,
        mode: str = "eval",
        channels: int = 6,
        seed: int = 0,
        prefetch_batches: int = 4,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader not built: run `make -C native`")
        self._lib = lib
        self.batch_size = batch_size
        self.out_size = out_size
        self.channels = channels
        n = len(paths)
        self._c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        self._c_labels = (ctypes.c_int32 * n)(*[int(l) for l in labels])
        self._handle = lib.bcos_loader_create(
            self._c_paths,
            self._c_labels,
            n,
            out_size,
            resize_size,
            batch_size,
            num_threads,
            1 if mode == "train" else 0,
            channels,
            seed,
            prefetch_batches,
        )
        self._epoch = 0

    def __len__(self) -> int:
        return self._lib.bcos_loader_n_batches(self._handle)

    def set_epoch(self, epoch: int):
        self._lib.bcos_loader_reset(self._handle, epoch)
        self._epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        n_batches = len(self)
        for _ in range(n_batches):
            images = np.empty(
                (self.batch_size, self.out_size, self.out_size, self.channels),
                np.float32,
            )
            labels = np.empty((self.batch_size,), np.int32)
            got = self._lib.bcos_loader_next(
                self._handle,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if got == 0:
                break
            yield {"image": images[:got], "label": labels[:got]}
        self.set_epoch(self._epoch + 1)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bcos_loader_destroy(self._handle)
                self._handle = None
        except Exception:
            pass

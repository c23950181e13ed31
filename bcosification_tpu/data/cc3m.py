"""CC3M as a webdataset-style tar-shard pipeline, dependency-free.

Parity target: `/root/reference/bcos/data/cc3m.py` (wds SimpleShardList ->
split_by_worker -> tarfile_to_samples -> decode(pilrgb) -> rename/map ->
batched with custom collators carrying the sample __key__ for img<->text
alignment) and the CC3M datamodule wiring
(`/root/reference/bcos/data/datamodules.py:462-521`, shards
training/{00000..00331}.tar, validation/{00000..00001}.tar).

Implemented as a plain-python streaming tar reader: grouped by key prefix,
decoded with PIL, batched with partial batches dropped (wds.batched
partial=False).
"""
from __future__ import annotations

import io
import os
import re
import tarfile
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from bcosification_tpu import settings

__all__ = [
    "expand_shard_pattern",
    "iter_tar_samples",
    "WdsPipeline",
    "CC3MDataModule",
]

_BRACE_RE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def expand_shard_pattern(pattern: str) -> List[str]:
    """Expand '{00000..00331}.tar' brace patterns (wds.SimpleShardList)."""
    m = _BRACE_RE.search(pattern)
    if not m:
        return [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    return [
        pattern[: m.start()] + str(i).zfill(width) + pattern[m.end() :]
        for i in range(int(lo), int(hi) + 1)
    ]


IMAGE_EXTS = ("jpg", "jpeg", "png", "webp")


def iter_tar_samples(shard_path: str) -> Iterator[Dict[str, object]]:
    """Stream one tar shard as dicts {__key__, jpg/txt/json/...: bytes}
    (wds.tarfile_to_samples)."""
    current_key = None
    sample: Dict[str, object] = {}
    with tarfile.open(shard_path, "r|*") as tf:
        for member in tf:
            if not member.isfile():
                continue
            name = member.name
            if "." not in name:
                continue
            key, ext = name.split(".", 1)
            if key != current_key:
                if current_key is not None and sample:
                    yield sample
                current_key = key
                sample = {"__key__": key}
            f = tf.extractfile(member)
            if f is not None:
                sample[ext.lower()] = f.read()
        if current_key is not None and sample:
            yield sample


def _decode_image(data: bytes) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        return img.convert("RGB")


@dataclass
class WdsPipeline:
    """Iterable over batches from a set of tar shards.

    mode 'image': yields {'image': [B,H,W,C], 'key': [B]}
    mode 'text':  yields {'text': [B,77] tokens, 'key': [B]}
    mode 'pair':  yields {'image': ..., 'text': ..., 'key': ...}
    """

    shards: Sequence[str]
    batch_size: int
    mode: str = "pair"
    transform: Optional[Callable] = None
    tokenizer: Optional[Callable] = None
    shuffle_buffer: int = 0
    seed: int = 0
    drop_partial: bool = True
    # native decode path (native/bcos_loader.cpp::bcos_decode_transform_mem):
    # "auto" uses it when the transform is one of the two CLIP-KD presets the
    # C++ transform implements exactly (RRC+flip train / resize+center-crop
    # eval, raw [0,1] 3-channel) and the library is built; True demands it
    # (raises otherwise); False forces the PIL path. Decodes run batch-at-a-
    # time in a thread pool — ctypes releases the GIL, so they scale with
    # cores (measured in scripts/bench_loader.py --wds).
    native_decode: object = "auto"
    num_threads: int = 8

    def _samples(self) -> Iterator[Dict[str, object]]:
        rng = np.random.default_rng(self.seed)
        shards = list(self.shards)
        if self.shuffle_buffer:
            rng.shuffle(shards)
        buf: List[Dict[str, object]] = []
        for shard in shards:
            for s in iter_tar_samples(shard):
                if self.shuffle_buffer:
                    buf.append(s)
                    if len(buf) >= self.shuffle_buffer:
                        idx = rng.integers(len(buf))
                        buf[idx], buf[-1] = buf[-1], buf[idx]
                        yield buf.pop()
                else:
                    yield s
        while buf:
            idx = np.random.default_rng(self.seed).integers(len(buf))
            buf[idx], buf[-1] = buf[-1], buf[idx]
            yield buf.pop()

    def _prepare(self, s: Dict[str, object]) -> Optional[Dict[str, object]]:
        out: Dict[str, object] = {"key": s["__key__"]}
        if self.mode in ("image", "pair"):
            img_bytes = next((s[e] for e in IMAGE_EXTS if e in s), None)
            if img_bytes is None:
                return None
            img = _decode_image(img_bytes)
            if self.transform is not None:
                img = self.transform(img)
            out["image"] = np.asarray(img, np.float32)
        if self.mode in ("text", "pair"):
            if "txt" not in s:
                return None
            out["text"] = s["txt"].decode("utf-8", errors="replace")
        return out

    def _native_plan(self):
        """(train_mode, out_size, resize_size) when `transform` is one of the
        CLIP-KD presets the native transform implements exactly, else None."""
        if self.native_decode is False or self.mode == "text":
            return None
        from bcosification_tpu.data import native_loader
        from bcosification_tpu.data.presets import (
            CLIPBcosImageNetClassificationPresetEval,
            CLIPBcosImageNetClassificationPresetTrain,
        )

        t, plan = self.transform, None
        if isinstance(t, CLIPBcosImageNetClassificationPresetTrain):
            a = t.args
            if a.get("interpolation") == "bilinear" and a.get("hflip_prob") == 0.5:
                plan = (True, a["crop_size"], 256)
        elif isinstance(t, CLIPBcosImageNetClassificationPresetEval):
            a = t.args
            if a.get("interpolation") == "bilinear":
                plan = (False, a["crop_size"], a.get("resize_size", 256))
        if plan is None:
            if self.native_decode is True:
                raise ValueError(
                    f"native_decode=True but transform {type(t).__name__} is "
                    "not one of the native-equivalent CLIP presets"
                )
            return None
        if not native_loader.native_available():
            if self.native_decode is True:
                raise RuntimeError(
                    "native_decode=True but libbcos_loader.so is not built "
                    "(run `make -C native`)"
                )
            return None
        return plan

    def _iter_native(self, plan):
        """Batch-at-a-time native decode in a thread pool; PIL fallback for
        members libjpeg rejects (png/webp)."""
        from concurrent.futures import ThreadPoolExecutor

        from bcosification_tpu.data import native_loader

        train, out_size, resize_size = plan

        def decode(args):
            idx, img_bytes = args
            out = native_loader.decode_transform_bytes(
                img_bytes,
                out_size=out_size,
                resize_size=resize_size,
                channels=3,
                train=train,
                seed=(self.seed * 0x9E3779B97F4A7C15 + idx) & (2**64 - 1),
            )
            if out is None:  # non-JPEG member: the PIL + python-preset path
                img = _decode_image(img_bytes)
                out = np.asarray(
                    self.transform(img) if self.transform is not None else img,
                    np.float32,
                )
            return out

        with ThreadPoolExecutor(self.num_threads) as pool:
            pending: List[Dict[str, object]] = []
            raw: List[Tuple[int, bytes]] = []
            for i, s in enumerate(self._samples()):
                img_bytes = next((s[e] for e in IMAGE_EXTS if e in s), None)
                if img_bytes is None:
                    continue
                if self.mode == "pair" and "txt" not in s:
                    continue
                entry: Dict[str, object] = {"key": s["__key__"]}
                if self.mode == "pair":
                    entry["text"] = s["txt"].decode("utf-8", errors="replace")
                pending.append(entry)
                raw.append((i, img_bytes))
                if len(pending) == self.batch_size:
                    for e, img in zip(pending, pool.map(decode, raw)):
                        e["image"] = img
                    yield self._collate(pending)
                    pending, raw = [], []
            if pending and not self.drop_partial:
                for e, img in zip(pending, pool.map(decode, raw)):
                    e["image"] = img
                yield self._collate(pending)

    def __iter__(self):
        plan = self._native_plan()
        if plan is not None:
            yield from self._iter_native(plan)
            return
        batch: List[Dict[str, object]] = []
        for s in self._samples():
            p = self._prepare(s)
            if p is None:
                continue
            batch.append(p)
            if len(batch) == self.batch_size:
                yield self._collate(batch)
                batch = []
        if batch and not self.drop_partial:
            yield self._collate(batch)

    def _collate(self, batch: List[Dict[str, object]]):
        out: Dict[str, object] = {"key": [b["key"] for b in batch]}
        if "image" in batch[0]:
            out["image"] = np.stack([b["image"] for b in batch])
        if "text" in batch[0]:
            texts = [b["text"] for b in batch]
            out["text"] = (
                self.tokenizer(texts) if self.tokenizer is not None else texts
            )
        return out


from bcosification_tpu.data.datamodules import ClassificationDataModule  # noqa: E402


class CC3MDataModule(ClassificationDataModule):
    """datamodules.py:462-521."""

    NUM_CLASSES = -1  # image-text pairs, no labels

    TRAIN_SHARDS = "training/{00000..00331}.tar"
    VAL_SHARDS = "validation/{00000..00001}.tar"

    def setup(self, stage: Optional[str] = None):
        root = self.config.get("data_root") or settings.CC3M_PATH
        assert root, "Set CC3M_PATH"
        from bcosification_tpu.clip.tokenizer import tokenize

        def shards(pattern):
            return expand_shard_pattern(os.path.join(root, pattern))

        if stage in (None, "fit", "train"):
            self.train_dataset = WdsPipeline(
                shards(self.TRAIN_SHARDS),
                self.batch_size,
                mode="pair",
                transform=self.config["train_transform"],
                tokenizer=tokenize,
                shuffle_buffer=self.config.get("shuffle_buffer", 1000),
            )
        self.eval_dataset = WdsPipeline(
            shards(self.VAL_SHARDS),
            self.batch_size,
            mode="pair",
            transform=self.config["test_transform"],
            tokenizer=tokenize,
        )

    def train_dataloader(self, seed: int = 0):
        return self.train_dataset

    def val_dataloader(self):
        return self.eval_dataset

    test_dataloader = val_dataloader

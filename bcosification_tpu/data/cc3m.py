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
    # "auto" uses it when the transform is the CLIP-KD TRAIN preset (RRC +
    # flip, raw [0,1] 3-channel — random augmentation, so the native
    # resampler's non-antialiased bilinear only changes the augmentation
    # distribution, not any parity-relevant numerics) and the library is
    # built. The EVAL preset is deterministic and feeds parity-sensitive
    # validation/zeroshot metrics, so "auto" leaves it on PIL; pass True to
    # force native for either preset (raises if unavailable/mismatched),
    # False to force PIL. Decodes run in a thread pool — ctypes releases the
    # GIL, so they scale with cores (the wds rows of scripts/bench_loader.py).
    native_decode: object = "auto"
    num_threads: int = 8
    # loop the shard stream indefinitely. Multi-host split shards give hosts
    # UNEQUAL shard/sample counts; the trainer then drives every host for a
    # common steps_per_epoch (a jitted collective step sequence must be
    # identical across processes or the pod hangs), which requires each
    # host's stream to never run dry. Each pass reshuffles (seed, epoch,
    # pass)-keyed.
    repeat: bool = False

    def set_epoch(self, epoch: int):
        """Vary shard order and (native path) augmentation draws per epoch —
        the trainer's fit loops call this when present."""
        self._epoch = int(epoch)

    def _samples(self) -> Iterator[Dict[str, object]]:
        rng = np.random.default_rng(
            (self.seed, getattr(self, "_epoch", 0), getattr(self, "_pass", 0))
        )
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
        while buf:  # drain with the SAME stream (a fresh rng per pop would
            # draw the same relative index every time — barely a shuffle)
            idx = rng.integers(len(buf))
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
        """(train_mode, out_size, resize_size) when the native transform can
        serve `transform`, else None.

        "auto" activates only for the TRAIN preset: its crops/flips are random
        draws, so the native resampler changes the augmentation distribution,
        not any deterministic numerics. The EVAL preset feeds parity-sensitive
        validation, so it needs an explicit truthy native_decode."""
        auto = self.native_decode == "auto"
        strict = (not auto) and bool(self.native_decode)  # any truthy value
        if (not strict and not auto) or self.mode == "text":
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
        elif isinstance(t, CLIPBcosImageNetClassificationPresetEval) and strict:
            a = t.args
            if a.get("interpolation") == "bilinear":
                plan = (False, a["crop_size"], a.get("resize_size", 256))
        if plan is None:
            if strict:
                raise ValueError(
                    f"native_decode={self.native_decode!r} but transform "
                    f"{type(t).__name__} is not one of the native-equivalent "
                    "CLIP presets"
                )
            return None
        if not native_loader.native_available():
            if strict:
                raise RuntimeError(
                    f"native_decode={self.native_decode!r} but "
                    "libbcos_loader.so is not built (run `make -C native`)"
                )
            return None
        return plan

    def _sample_seed(self, idx: int) -> int:
        # distinct per (pipeline seed, epoch, sample index): epochs must not
        # repeat augmentation draws (set_epoch), runs with one seed must
        return (
            (self.seed * 0x9E3779B97F4A7C15)
            ^ (getattr(self, "_epoch", 0) * 0xC2B2AE3D27D4EB4F)
            ^ (getattr(self, "_pass", 0) * 0xA24BAED4963EE407)
            ^ idx
        ) & (2**64 - 1)

    def _iter_native(self, plan):
        """Native decode in a thread pool, futures submitted as tar members
        stream in (decode overlaps shard I/O); seeded PIL fallback for members
        libjpeg rejects (png/webp)."""
        from concurrent.futures import ThreadPoolExecutor

        from bcosification_tpu.data import native_loader

        train, out_size, resize_size = plan

        def decode(idx, img_bytes):
            seed = self._sample_seed(idx)
            out = native_loader.decode_transform_bytes(
                img_bytes,
                out_size=out_size,
                resize_size=resize_size,
                channels=3,
                train=train,
                seed=seed,
            )
            if out is None:  # non-JPEG member (png/webp): seeded PIL fallback
                out = self._fallback_decode(img_bytes, plan, seed)
            return out

        with ThreadPoolExecutor(self.num_threads) as pool:
            pending: List[Dict[str, object]] = []
            futs: List[object] = []
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
                futs.append(pool.submit(decode, i, img_bytes))
                if len(pending) == self.batch_size:
                    for e, f in zip(pending, futs):
                        e["image"] = f.result()
                    yield self._collate(pending)
                    pending, futs = [], []
            if pending and not self.drop_partial:
                for e, f in zip(pending, futs):
                    e["image"] = f.result()
                yield self._collate(pending)

    def _fallback_decode(self, img_bytes: bytes, plan, seed: int) -> np.ndarray:
        """PIL path for non-JPEG members, with the SAME per-sample seed
        driving the random draws so the pipeline stays reproducible."""
        from bcosification_tpu.data import transforms as T

        train, out_size, resize_size = plan
        img = _decode_image(img_bytes)
        rng = np.random.default_rng(seed)
        if train:
            tf = T.Compose([
                T.RandomResizedCrop(out_size, rng=rng),
                T.RandomHorizontalFlip(0.5, rng=rng),
                T.ToFloatArray(),
            ])
        else:
            tf = T.Compose([
                T.Resize(resize_size), T.CenterCrop(out_size), T.ToFloatArray(),
            ])
        return np.asarray(tf(img), np.float32)

    def __iter__(self):
        self._pass = 0
        while True:
            yield from self._iter_once()
            if not self.repeat:
                return
            self._pass += 1

    def _iter_once(self):
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

        def shards(pattern, split=False):
            out = expand_shard_pattern(os.path.join(root, pattern))
            if split and self.config.get("split_shards_by_process", False):
                # multi-host input scaling (opt-in): each host streams only
                # its own train shards and feeds the global batch via
                # mesh.shard_batch_local — wds split_by_worker semantics
                # (ref cc3m.py:75-103). Validation stays replicated so every
                # host computes identical val metrics.
                import jax

                pi, pc = jax.process_index(), jax.process_count()
                assert len(out) >= pc, (
                    f"{len(out)} shards cannot cover {pc} processes"
                )
                out = out[pi::pc]
            return out

        if stage in (None, "fit", "train"):
            split_active = bool(self.config.get("split_shards_by_process", False))
            self.train_dataset = WdsPipeline(
                shards(self.TRAIN_SHARDS, split=True),
                self.batch_size,
                mode="pair",
                transform=self.config["train_transform"],
                tokenizer=tokenize,
                shuffle_buffer=self.config.get("shuffle_buffer", 1000),
                # split hosts hold unequal shard/sample counts; the stream
                # must repeat so the trainer can drive a COMMON
                # steps_per_epoch on every host (jitted collective step
                # sequences must match across processes)
                repeat=split_active,
            )
        self.eval_dataset = WdsPipeline(
            shards(self.VAL_SHARDS),
            self.batch_size,
            mode="pair",
            transform=self.config["test_transform"],
            tokenizer=tokenize,
        )

    def train_dataloader(self, seed: int = 0):
        # thread the run's configured seed into the pipeline — shard order,
        # shuffle-buffer draws and native augmentation crops are all keyed
        # on it (r5 review: the argument used to be silently dropped, so
        # every seed produced bit-identical streams)
        self.train_dataset.seed = int(seed)
        return self.train_dataset

    def val_dataloader(self):
        return self.eval_dataset

    test_dataloader = val_dataloader

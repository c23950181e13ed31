#!/usr/bin/env python
"""Input-pipeline throughput benchmark (sustained img/s on the host CPU).

Measures the three ImageNet loading paths against the train-step consumption
rate (2075 img/s/chip, docs/PERF.md "Training-step throughput"):

  (a) native C++ loader (libjpeg thread pool, fused decode+crop+AddInverse)
  (b) CachedImageFolder (mmap decoded-uint8 cache) + python DataLoader
  (c) plain ImageFolder (PIL decode per epoch) + python DataLoader

Reference motivation: the reference spends ~620 LoC on SHM/Redis caching
(`/root/reference/bcos/data/caching/shm_caching.py:10-45`) precisely because
host-side decode bounds GPU training; this script is the measured equivalent
for the TPU build. Results belong in docs/PERF.md.

Usage: python scripts/bench_loader.py [--images 2000] [--threads 16]
"""
import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TREE = Path("/tmp/bcos_loader_bench")


def build_tree(n_images: int, n_classes: int = 16, size=(500, 375)) -> Path:
    """Synthetic ImageNet-val-like JPEG tree (noise JPEGs decode slower than
    natural images — conservative)."""
    from PIL import Image

    root = TREE / f"n{n_images}"
    done = root / ".done"
    if done.exists():
        return root
    if root.exists():
        shutil.rmtree(root)
    rng = np.random.default_rng(0)
    per = n_images // n_classes
    for c in range(n_classes):
        d = root / "train" / f"class{c:04d}"
        d.mkdir(parents=True)
        for i in range(per):
            # smooth noise -> realistic JPEG entropy (pure noise is worst-case)
            arr = rng.integers(0, 255, (size[1] // 8, size[0] // 8, 3), np.uint8)
            img = Image.fromarray(arr).resize(size, Image.BILINEAR)
            img.save(d / f"{i}.jpg", quality=90)
    done.touch()
    return root


def _drain(loader, n_epochs=1, warmup_batches=2):
    """-> (img/s, n_images) steady-state (excludes the first warmup batches).

    The clock starts at the END of the last warmup batch and only batches
    fetched strictly inside the timed interval count — the old code counted
    the clock-starting batch itself (its fetch happened before t0),
    inflating every rate by 1/measured_batches (~8% at the default 16-batch
    run), and crashed with TypeError when the loader yielded fewer than
    warmup_batches+1 batches (r5 review)."""
    n = 0
    t0 = None
    for _ in range(n_epochs):
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(np.random.randint(1 << 30))
        for i, batch in enumerate(loader):
            img = batch["image"] if isinstance(batch, dict) else batch[0]
            if t0 is None:
                if i + 1 >= warmup_batches:  # warmup complete after this batch
                    t0 = time.perf_counter()
                continue
            n += len(img)
    if t0 is None or n == 0:
        raise ValueError(
            f"loader yielded too few batches to measure (need more than "
            f"{warmup_batches}); lower the batch size or add images"
        )
    dt = time.perf_counter() - t0
    return n / dt, n


def bench_plain(root, batch_size, threads):
    from bcosification_tpu.data.datamodules import ImageFolder
    from bcosification_tpu.data.loader import DataLoader
    from bcosification_tpu.data.presets import ImageNetClassificationPresetTrain

    tf = ImageNetClassificationPresetTrain(crop_size=224, is_bcos=True)
    ds = ImageFolder(str(root / "train"), transform=tf)
    loader = DataLoader(ds, batch_size, shuffle=True, num_workers=threads)
    return _drain(loader)


def bench_cached(root, batch_size, threads):
    from bcosification_tpu.data import transforms as T
    from bcosification_tpu.data.caching import CachedImageFolder
    from bcosification_tpu.data.datamodules import ImageFolder
    from bcosification_tpu.data.loader import DataLoader

    cache_dir = TREE / "cache"
    if cache_dir.exists():
        shutil.rmtree(cache_dir)
    ds = ImageFolder(str(root / "train"), transform=None)
    # post-cache transform: crop/flip/AddInverse on the cached uint8 array
    tf = T.Compose(
        [
            T.RandomResizedCrop(224),
            T.RandomHorizontalFlip(0.5),
            T.ToFloatArray(),
            T.AddInverse(),
        ]
    )
    cds = CachedImageFolder(ds, cache_size=256, cache_dir=str(cache_dir), transform=tf)
    fill_loader = DataLoader(cds, batch_size, shuffle=False, num_workers=threads)
    t0 = time.perf_counter()
    n_fill = sum(len(b["image"] if isinstance(b, dict) else b[0]) for b in fill_loader)
    fill_rate = n_fill / (time.perf_counter() - t0)
    loader = DataLoader(cds, batch_size, shuffle=True, num_workers=threads)
    hot, n = _drain(loader)
    return fill_rate, hot, n


def bench_native(root, batch_size, threads, mode):
    from bcosification_tpu.data.datamodules import ImageFolder
    from bcosification_tpu.data.native_loader import NativeImageLoader, native_available

    if not native_available():
        return None
    ds = ImageFolder(str(root / "train"), transform=None)
    paths = [p for p, _ in ds.samples]
    labels = [l for _, l in ds.samples]
    loader = NativeImageLoader(
        paths, labels, out_size=224, batch_size=batch_size,
        num_threads=threads, mode=mode,
    )
    return _drain(loader)


def build_wds_shards(root: Path, n_images: int, per_shard: int = 500, size=(500, 375)):
    """Synthetic CC3M-like tar shards (jpg + txt per key)."""
    import io
    import tarfile

    from PIL import Image

    wds_dir = root / "wds"
    done = wds_dir / ".done"
    if done.exists():
        return sorted(str(p) for p in wds_dir.glob("*.tar"))
    wds_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    shard_idx, tf = -1, None
    for i in range(n_images):
        if i % per_shard == 0:
            if tf is not None:
                tf.close()
            shard_idx += 1
            tf = tarfile.open(wds_dir / f"{shard_idx:05d}.tar", "w")
        arr = rng.integers(0, 255, (size[1] // 8, size[0] // 8, 3), np.uint8)
        img = Image.fromarray(arr).resize(size, Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        data = buf.getvalue()
        info = tarfile.TarInfo(f"{i:07d}.jpg")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
        txt = f"caption number {i}".encode()
        info = tarfile.TarInfo(f"{i:07d}.txt")
        info.size = len(txt)
        tf.addfile(info, io.BytesIO(txt))
    if tf is not None:
        tf.close()
    done.touch()
    return sorted(str(p) for p in wds_dir.glob("*.tar"))


def bench_wds(root, batch_size, threads, n_images, native):
    """CC3M KD pipeline (WdsPipeline, train preset) img/s — native in-memory
    decode pool vs the single-threaded PIL path. Target: the measured KD
    train consumption of 1520 img/s/chip (docs/PERF.md)."""
    from bcosification_tpu.data.cc3m import WdsPipeline
    from bcosification_tpu.data.native_loader import native_available
    from bcosification_tpu.data.presets import (
        CLIPBcosImageNetClassificationPresetTrain,
    )

    if native and not native_available():
        return None  # degrade like bench_native (strict mode would raise)
    shards = build_wds_shards(root, n_images)
    pipe = WdsPipeline(
        shards, batch_size, mode="pair",
        transform=CLIPBcosImageNetClassificationPresetTrain(crop_size=224),
        tokenizer=None,  # tokenization is not the bottleneck being measured
        native_decode=native, num_threads=threads,
    )
    return _drain(pipe)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--json", action="store_true", help="one JSON line only")
    args = ap.parse_args(argv)

    root = build_tree(args.images)
    results = {}

    r = bench_native(root, args.batch_size, args.threads, "train")
    if r:
        results["native_train"] = round(r[0], 1)
    r = bench_native(root, args.batch_size, args.threads, "eval")
    if r:
        results["native_eval"] = round(r[0], 1)

    r = bench_wds(root, args.batch_size, args.threads, args.images, native=True)
    if r:
        results["wds_native_train"] = round(r[0], 1)
    r = bench_wds(root, args.batch_size, args.threads, args.images, native=False)
    if r:
        results["wds_python_train"] = round(r[0], 1)

    fill, hot, _ = bench_cached(root, args.batch_size, args.threads)
    results["cached_fill"] = round(fill, 1)
    results["cached_hot"] = round(hot, 1)

    rate, _ = bench_plain(root, args.batch_size, args.threads)
    results["plain_imagefolder"] = round(rate, 1)

    results["train_consumption_target"] = 2075  # img/s/chip, docs/PERF.md
    out = {
        "bench": "input_pipeline",
        "images": args.images,
        "batch_size": args.batch_size,
        "threads": args.threads,
        **results,
    }
    if not args.json:
        for k, v in results.items():
            print(f"{k:28s} {v:>10} img/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

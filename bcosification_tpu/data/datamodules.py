"""Data modules with a name registry, torch/lightning-free.

Parity target: `/root/reference/bcos/data/datamodules.py`: the
`ClassificationDataModule` registry base (datamodules.py:46-189) with
mixup/cutmix/gridify collate and RASampler hookup; ImageNet (ImageFolder),
CIFAR10 (native pickle-batch reader), VOC (multilabel XML), CC3M (webdataset —
see cc3m.py).

The SHM-tar / Redis caching backends (datamodules.py:201-252,
data/caching/) are replaced by the local-SSD cache in settings.LOCAL_CACHE_DIR
— on TPU VMs images live on fast local disk, so `cache_dataset` accepts
'onthefly'/'shm'/None for CLI compatibility but they are no-ops.
"""
from __future__ import annotations

import os
import pickle
import tarfile
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from bcosification_tpu import settings
from bcosification_tpu.data import transforms as T
from bcosification_tpu.data.categories import (
    CIFAR100_CATEGORIES,
    FASHION_MNIST_CATEGORIES,
    STL10_CATEGORIES,
    CIFAR10_CATEGORIES,
    IMAGENET_CATEGORIES,
    VOC_CATEGORIES,
)
from bcosification_tpu.data.loader import DataLoader, default_collate
from bcosification_tpu.data.sampler import RASampler

__all__ = [
    "ClassificationDataModule",
    "ImageNetDataModule",
    "CIFAR10DataModule",
    "VOCDataModule",
    "ImageFolder",
]

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp", ".jfif")


class ImageFolder:
    """torchvision-style ImageFolder: root/class_x/xxx.jpg."""

    def __init__(self, root: str, transform: Optional[Callable] = None):
        self.root = Path(root)
        self.transform = transform
        classes = sorted(
            d.name for d in os.scandir(self.root) if d.is_dir()
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.classes = classes
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = self.root / c
            for f in sorted(os.scandir(cdir), key=lambda e: e.name):
                if f.name.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((f.path, self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from PIL import Image

        path, target = self.samples[i]
        with Image.open(path) as img:
            img = img.convert("RGB")
            if self.transform is not None:
                img = self.transform(img)
        return np.asarray(img, np.float32), np.int32(target)


class ClassificationDataModule:
    """Registry base (datamodules.py:46-189)."""

    NUM_CLASSES: Optional[int] = None
    NUM_TRAIN_EXAMPLES: Optional[int] = None
    NUM_EVAL_EXAMPLES: Optional[int] = None
    CATEGORIES: Optional[List[str]] = None

    __registry: Dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        assert cls.NUM_CLASSES is not None
        name = cls.__name__
        if not name.endswith("DataModule"):
            raise ValueError(f"'{name}' does not end with 'DataModule'")
        name = name[: -len("DataModule")]
        if name in ClassificationDataModule.__registry:
            raise ValueError(f"Data module {name} already registered")
        ClassificationDataModule.__registry[name] = cls

    @classmethod
    def registry(cls) -> Dict[str, type]:
        return dict(cls.__registry)

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.batch_size = config["batch_size"]
        self.num_workers = config.get("num_workers", 8)
        self.train_dataset = None
        self.eval_dataset = None
        self.train_collate_fn = self.get_train_collate_fn(
            config.get("mixup_alpha", 0.0),
            config.get("cutmix_alpha", 0.0),
            config.get("p_gridified", 0.0),
        )

    # -- abstract -------------------------------------------------------------
    def setup(self, stage: Optional[str] = None):
        raise NotImplementedError

    # -- loaders --------------------------------------------------------------
    def train_dataloader(self, seed: int = 0) -> DataLoader:
        sampler = self.get_train_sampler(seed)
        return DataLoader(
            self.train_dataset,
            self.batch_size,
            shuffle=sampler is None,
            sampler=sampler,
            num_workers=self.num_workers,
            collate_fn=self.train_collate_fn,
            drop_last=True,
            seed=seed,
        )

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.eval_dataset,
            self.batch_size,
            num_workers=self.num_workers,
            collate_fn=self._eval_collate,
        )

    test_dataloader = val_dataloader

    @staticmethod
    def _eval_collate(batch):
        # every consumer (Trainer.validate, evaluate.py, zeroshot) takes
        # {"image", "label"} dict batches, same as the train collate
        images, targets = default_collate(batch)
        return {"image": images, "label": targets}

    # -- collate (datamodules.py:136-171) --------------------------------------
    @classmethod
    def get_train_collate_fn(cls, mixup_alpha=0.0, cutmix_alpha=0.0, p_gridified=0.0):
        assert not (p_gridified and mixup_alpha), "For now, do not use both."
        collate_fn = None
        if p_gridified:
            gridify = T.SplitAndGrid(p_gridified, num_classes=cls.NUM_CLASSES)

            def collate_fn(batch):
                images, targets = default_collate(batch)
                images, targets = gridify(images, targets)
                return {"image": images, "label": targets}

        choices = []
        if mixup_alpha > 0.0:
            choices.append(T.RandomMixup(cls.NUM_CLASSES, p=1.0, alpha=mixup_alpha))
        if cutmix_alpha > 0.0:
            choices.append(T.RandomCutmix(cls.NUM_CLASSES, p=1.0, alpha=cutmix_alpha))
        if choices:
            def collate_fn(batch):  # noqa: F811
                images, targets = default_collate(batch)
                t = choices[np.random.randint(len(choices))]
                images, targets = t(images, targets)
                return {"image": images, "label": targets}

        if collate_fn is None:
            def collate_fn(batch):
                images, targets = default_collate(batch)
                return {"image": images, "label": targets}

        return collate_fn

    def get_train_sampler(self, seed: int = 0):
        # multi-host input scaling (opt-in, see docs/SCALING.md): each host
        # samples only its 1/process_count of the train set and the fit loop
        # stitches the global batch with mesh.shard_batch_local — the
        # reference's DistributedSampler division of labour. Off (default):
        # every host draws the identical global batch.
        rank, world = 0, 1
        if self.config.get("split_by_process", False):
            import jax

            rank, world = jax.process_index(), jax.process_count()
        ra_reps = self.config.get("ra_repetitions", None)
        if ra_reps is None and world == 1:
            return None
        # plain per-process split = repeated-augmentation sampler with
        # repetitions=1 (each sample once per epoch, rank-strided);
        # select_all skips the reference's 256-truncation ONLY on that
        # implicit path — explicit ra_repetitions (even 1) keeps the
        # truncation for steps/LR-schedule parity with the reference.
        return RASampler(
            self.train_dataset, num_replicas=world, rank=rank,
            shuffle=True, seed=seed, repetitions=ra_reps or 1,
            select_all=ra_reps is None,
        )


class ImageNetDataModule(ClassificationDataModule):
    NUM_CLASSES = 1000
    NUM_TRAIN_EXAMPLES = 1_281_167
    NUM_EVAL_EXAMPLES = 50_000
    CATEGORIES = IMAGENET_CATEGORIES

    def setup(self, stage: Optional[str] = None):
        root = self.config.get("data_root") or settings.IMAGENET_PATH
        assert root, "Set IMAGENET_PATH"
        cache = self.config.get("cache_dataset")
        if stage in (None, "fit", "train"):
            self.train_dataset = ImageFolder(
                os.path.join(root, "train"), self.config["train_transform"]
            )
            if cache in ("onthefly", "shm"):
                from bcosification_tpu.data.caching import CachedImageFolder

                self.train_dataset = CachedImageFolder(
                    self.train_dataset, use_shm=(cache == "shm")
                )
        self.eval_dataset = ImageFolder(
            os.path.join(root, "val"), self.config["test_transform"]
        )

    def _native(self, dataset, mode: str, seed: int = 0):
        """Optional C++ loader (config native_loader=True): fused libjpeg
        decode + crop/flip + AddInverse in a native thread pool — only valid
        for the standard is_bcos presets, which it replicates in C++."""
        from bcosification_tpu.data.native_loader import (
            NativeImageLoader,
            native_available,
        )

        if not (self.config.get("native_loader", False) and native_available()):
            return None
        samples = dataset.samples
        if mode == "train" and self.config.get("split_by_process", False):
            import jax

            world, rank = jax.process_count(), jax.process_index()
            if world > 1:
                # multi-host input scaling for the native path: a static
                # rank-strided disjoint split, truncated to the common
                # per-host length so every host runs the identical number
                # of steps per epoch (lockstep with shard_batch_local).
                # Per-epoch shuffling happens inside the loader over the
                # host's own partition (the partition itself is static,
                # like wds shard splits).
                per_host = len(samples) // world
                assert per_host >= self.batch_size, (
                    f"split_by_process: {len(samples)} samples over {world} "
                    f"hosts leaves {per_host} per host < batch_size"
                )
                samples = samples[rank::world][:per_host]
        paths = [p for p, _ in samples]
        labels = [l for _, l in samples]
        return NativeImageLoader(
            paths,
            labels,
            out_size=self.config.get("crop_size", 224),
            resize_size=self.config.get("resize_size", 256),
            batch_size=self.batch_size,
            num_threads=self.num_workers,
            mode=mode,
            seed=seed,
        )

    def train_dataloader(self, seed: int = 0):
        native = self._native(self.train_dataset, "train", seed)
        if native is not None:
            return native
        return super().train_dataloader(seed)

    def val_dataloader(self):
        native = self._native(self.eval_dataset, "eval")
        if native is not None:
            return native
        return super().val_dataloader()

    test_dataloader = val_dataloader


class _CIFAR10Dataset:
    """Native CIFAR-10 python-batch reader (no torchvision)."""

    def __init__(self, root: str, train: bool, transform=None):
        base = Path(root) / "cifar-10-batches-py"
        files = (
            [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        )
        xs, ys = [], []
        for f in files:
            with open(base / f, "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            xs.append(d[b"data"])
            ys.extend(d[b"labels"])
        self.data = (
            np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        )  # HWC uint8
        self.targets = np.asarray(ys, np.int32)
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        img = self.data[i]
        if self.transform is not None:
            img = self.transform(img)
        return np.asarray(img, np.float32), self.targets[i]


class CIFAR10DataModule(ClassificationDataModule):
    NUM_CLASSES = 10
    NUM_TRAIN_EXAMPLES = 50_000
    NUM_EVAL_EXAMPLES = 10_000
    CATEGORIES = CIFAR10_CATEGORIES

    def setup(self, stage: Optional[str] = None):
        root = self.config.get("data_root") or settings.DATA_ROOT
        assert root, "Set DATA_ROOT"
        if stage in (None, "fit", "train"):
            self.train_dataset = _CIFAR10Dataset(
                root, True, self.config["train_transform"]
            )
        self.eval_dataset = _CIFAR10Dataset(root, False, self.config["test_transform"])




class _CIFAR100Dataset:
    """Native CIFAR-100 python-pickle reader (fine labels)."""

    def __init__(self, root: str, train: bool, transform=None):
        base = Path(root) / "cifar-100-python"
        with open(base / ("train" if train else "test"), "rb") as fh:
            d = pickle.load(fh, encoding="bytes")
        self.data = (
            np.asarray(d[b"data"]).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        )
        self.targets = np.asarray(d[b"fine_labels"], np.int32)
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        img = self.data[i]
        if self.transform is not None:
            img = self.transform(img)
        return np.asarray(img, np.float32), self.targets[i]


class CIFAR100DataModule(ClassificationDataModule):
    NUM_CLASSES = 100
    NUM_TRAIN_EXAMPLES = 50_000
    NUM_EVAL_EXAMPLES = 10_000
    CATEGORIES = CIFAR100_CATEGORIES

    def setup(self, stage: Optional[str] = None):
        root = self.config.get("data_root") or settings.DATA_ROOT
        assert root, "Set DATA_ROOT"
        if stage in (None, "fit", "train"):
            self.train_dataset = _CIFAR100Dataset(
                root, True, self.config["train_transform"]
            )
        self.eval_dataset = _CIFAR100Dataset(root, False, self.config["test_transform"])


class _FashionMNISTDataset:
    """Native FashionMNIST idx-ubyte reader (gz or raw); greyscale replicated
    to 3 channels so the CLIP transform pipeline applies unchanged."""

    def __init__(self, root: str, train: bool, transform=None):
        import gzip as _gzip

        base = Path(root) / "FashionMNIST" / "raw"
        prefix = "train" if train else "t10k"

        def read(name):
            gz = base / f"{name}.gz"
            raw = base / name
            if gz.exists():
                with _gzip.open(gz, "rb") as fh:
                    return fh.read()
            return raw.read_bytes()

        imgs = read(f"{prefix}-images-idx3-ubyte")
        lbls = read(f"{prefix}-labels-idx1-ubyte")
        n = int.from_bytes(imgs[4:8], "big")
        self.data = np.frombuffer(imgs, np.uint8, offset=16).reshape(n, 28, 28)
        self.targets = np.frombuffer(lbls, np.uint8, offset=8).astype(np.int32)
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        img = np.repeat(self.data[i][..., None], 3, axis=-1)
        if self.transform is not None:
            img = self.transform(img)
        return np.asarray(img, np.float32), self.targets[i]


class FashionMNISTDataModule(ClassificationDataModule):
    NUM_CLASSES = 10
    NUM_TRAIN_EXAMPLES = 60_000
    NUM_EVAL_EXAMPLES = 10_000
    CATEGORIES = FASHION_MNIST_CATEGORIES

    def setup(self, stage: Optional[str] = None):
        root = self.config.get("data_root") or settings.DATA_ROOT
        assert root, "Set DATA_ROOT"
        if stage in (None, "fit", "train"):
            self.train_dataset = _FashionMNISTDataset(
                root, True, self.config["train_transform"]
            )
        self.eval_dataset = _FashionMNISTDataset(
            root, False, self.config["test_transform"]
        )


class _STL10Dataset:
    """Native STL-10 binary reader (uint8 [N,3,96,96] column-major planes)."""

    def __init__(self, root: str, train: bool, transform=None):
        base = Path(root) / "stl10_binary"
        split = "train" if train else "test"
        x = np.fromfile(base / f"{split}_X.bin", np.uint8)
        # stored as [N, C, W, H] column-major within each image
        self.data = x.reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1)  # -> NHWC
        y = np.fromfile(base / f"{split}_y.bin", np.uint8)
        self.targets = (y.astype(np.int32) - 1)  # labels are 1..10
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        img = self.data[i]
        if self.transform is not None:
            img = self.transform(img)
        return np.asarray(img, np.float32), self.targets[i]


class STL10DataModule(ClassificationDataModule):
    NUM_CLASSES = 10
    NUM_TRAIN_EXAMPLES = 5_000
    NUM_EVAL_EXAMPLES = 8_000
    CATEGORIES = STL10_CATEGORIES

    def setup(self, stage: Optional[str] = None):
        root = self.config.get("data_root") or settings.DATA_ROOT
        assert root, "Set DATA_ROOT"
        if stage in (None, "fit", "train"):
            self.train_dataset = _STL10Dataset(
                root, True, self.config["train_transform"]
            )
        self.eval_dataset = _STL10Dataset(root, False, self.config["test_transform"])


class _VOCDataset:
    """VOC multilabel dataset with XML annotation parse
    (datamodules.py:283-460).

    With ``also_annotation=True`` each item is (image, target, bbs) where
    bbs = [[class_idx, xmin, ymin, xmax, ymax], ...] with box coordinates
    rescaled to the ``bbox_size`` output resolution and clamped — exactly
    the reference's box path (ref datamodules.py:404-425, which hardcodes
    224), used by box-based localisation evaluation.
    """

    def __init__(
        self,
        root: str,
        image_set: str,
        transform=None,
        also_annotation: bool = False,
        bbox_size: int = 224,
    ):
        from xml.etree.ElementTree import parse as ET_parse

        self.root = Path(root)
        self.transform = transform
        self.also_annotation = also_annotation
        self.bbox_size = bbox_size
        split_file = (
            self.root / "ImageSets" / "Main" / f"{image_set}.txt"
        )
        with open(split_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        self.images = [self.root / "JPEGImages" / f"{i}.jpg" for i in ids]
        self.annotations = [self.root / "Annotations" / f"{i}.xml" for i in ids]
        self._parse = ET_parse
        self.cat_to_idx = {c: i for i, c in enumerate(VOC_CATEGORIES)}

    def __len__(self):
        return len(self.images)

    def _parse_objects(self, ann_path):
        """(target multilabel vector, [(name, bndbox-element)], (width, height))."""
        root = self._parse(ann_path).getroot()
        label = np.zeros(len(VOC_CATEGORIES), np.float32)
        objects = []
        for obj in root.iter("object"):
            name = obj.find("name").text
            if name in self.cat_to_idx:
                label[self.cat_to_idx[name]] = 1.0
                objects.append((name, obj.find("bndbox")))
        size = root.find("size")
        width = int(size.find("width").text) if size is not None else None
        height = int(size.find("height").text) if size is not None else None
        return label, objects, (width, height)

    def _target(self, ann_path) -> np.ndarray:
        return self._parse_objects(ann_path)[0]

    def _bboxes(self, objects, width, height):
        """[[class_idx, xmin, ymin, xmax, ymax]] rescaled to bbox_size
        (ref datamodules.py:404-425: int() truncation, clamp to [0, S-1])."""
        S = self.bbox_size
        wscale, hscale = S / width, S / height
        bbs = []
        for name, box in objects:
            xmin, xmax = int(box.find("xmin").text), int(box.find("xmax").text)
            ymin, ymax = int(box.find("ymin").text), int(box.find("ymax").text)
            bbs.append([
                self.cat_to_idx[name],
                int(min(max(xmin * wscale, 0), S - 1)),
                int(min(max(ymin * hscale, 0), S - 1)),
                int(min(max(xmax * wscale, 0), S - 1)),
                int(min(max(ymax * hscale, 0), S - 1)),
            ])
        return bbs

    def __getitem__(self, i):
        from PIL import Image

        with Image.open(self.images[i]) as img:
            img = img.convert("RGB")
            size = img.size  # (width, height) before transform
            if self.transform is not None:
                img = self.transform(img)
        image = np.asarray(img, np.float32)
        label, objects, (width, height) = self._parse_objects(self.annotations[i])
        if self.also_annotation:
            width, height = width or size[0], height or size[1]
            return image, label, self._bboxes(objects, width, height)
        return image, label


class VOCDataModule(ClassificationDataModule):
    NUM_CLASSES = 20
    CATEGORIES = VOC_CATEGORIES

    def setup(self, stage: Optional[str] = None):
        root = self.config.get("data_root") or settings.VOC_PATH
        assert root, "Set VOC_PATH"
        also_annotation = bool(self.config.get("also_annotation", False))
        if stage in (None, "fit", "train"):
            self.train_dataset = _VOCDataset(
                root, "trainval", self.config["train_transform"]
            )
        self.eval_dataset = _VOCDataset(
            root, "val", self.config["test_transform"],
            also_annotation=also_annotation,
        )

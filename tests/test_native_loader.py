"""Native C++ loader tests: decode parity vs PIL (both use libjpeg), batching,
epoch reshuffle determinism."""
import numpy as np
import pytest

from bcosification_tpu.data.native_loader import (
    NativeImageLoader,
    decode_resize,
    native_available,
)

def needs_native(fn):
    """Runtime (not collection-time) skip: the session-scoped
    fresh_native_build fixture in conftest.py rebuilds the library AFTER
    collection, so an import-time skipif would wrongly skip on a stale
    checked-in .so that the fresh build fixes."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not native_available():
            pytest.skip("libbcos_loader.so not built")
        return fn(*args, **kwargs)

    return wrapper


@pytest.fixture
def jpeg_dir(tmp_path, rng):
    from PIL import Image

    paths, labels = [], []
    for i in range(8):
        # smooth images: resize-kernel differences (PIL antialiases, the
        # native loader point-samples) are negligible on smooth content
        h, w = 100 + 8 * i, 120
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [
                127 + 120 * np.sin(yy / 17.0 + i),
                127 + 120 * np.cos(xx / 23.0),
                127 + 120 * np.sin((xx + yy) / 31.0),
            ],
            axis=-1,
        ).clip(0, 255).astype(np.uint8)
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
        labels.append(i % 3)
    return paths, labels


@needs_native
def test_decode_resize_matches_pil(jpeg_dir):
    from PIL import Image

    paths, _ = jpeg_dir
    out = decode_resize(paths[0], out_size=64, resize_size=72, channels=6)
    assert out is not None and out.shape == (64, 64, 6)
    # AddInverse consistency
    np.testing.assert_allclose(out[..., 3:], 1.0 - out[..., :3], atol=1e-6)

    # PIL reference: same libjpeg decode, bilinear resize + center crop
    from bcosification_tpu.data import transforms as T

    ref = T.Compose([T.Resize(72), T.CenterCrop(64), T.ToFloatArray(), T.AddInverse()])
    with Image.open(paths[0]) as img:
        want = ref(img.convert("RGB"))
    # resize kernels differ slightly (PIL uses antialiased bilinear); compare
    # loosely on the mean/structure
    assert out.shape == want.shape
    assert abs(float(out[..., :3].mean()) - float(want[..., :3].mean())) < 0.02
    corr = np.corrcoef(out[..., :3].ravel(), want[..., :3].ravel())[0, 1]
    assert corr > 0.995


@needs_native
def test_decode_transform_bytes_matches_file_path(jpeg_dir):
    """The in-memory (webdataset) entry point runs the exact same decode +
    transform code as the file path: bitwise-equal eval outputs."""
    from bcosification_tpu.data.native_loader import decode_transform_bytes

    paths, _ = jpeg_dir
    data = open(paths[0], "rb").read()
    via_file = decode_resize(paths[0], out_size=64, resize_size=72, channels=6)
    via_mem = decode_transform_bytes(
        data, out_size=64, resize_size=72, channels=6, train=False
    )
    np.testing.assert_array_equal(via_mem, via_file)
    # corrupt buffer -> honest failure, not garbage
    assert decode_transform_bytes(b"not a jpeg") is None
    # train mode: seed-deterministic, seed-sensitive
    a = decode_transform_bytes(data, out_size=32, channels=3, train=True, seed=7)
    b = decode_transform_bytes(data, out_size=32, channels=3, train=True, seed=7)
    c = decode_transform_bytes(data, out_size=32, channels=3, train=True, seed=8)
    np.testing.assert_array_equal(a, b)
    assert float(np.abs(a - c).max()) > 0


@needs_native
def test_batched_loader(jpeg_dir):
    paths, labels = jpeg_dir
    loader = NativeImageLoader(
        paths, labels, out_size=32, resize_size=40, batch_size=4, num_threads=2,
        mode="eval",
    )
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 6)
        assert np.isfinite(b["image"]).all()
        assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
    # eval mode preserves order
    np.testing.assert_array_equal(
        np.concatenate([b["label"] for b in batches]), np.asarray(labels)
    )


@needs_native
def test_corrupt_jpeg_fills_neutral_not_zero(jpeg_dir, tmp_path):
    """A failed decode must NOT produce an exact-zero sample: B-cos/LN
    layers have inf sqrt-VJP partials on zero rows (0*inf=NaN, the repo's
    dead-slot rule) — one corrupt ImageNet JPEG would NaN the whole batch
    gradient. The loader fills mid-gray (0.5 in all 6 AddInverse channels,
    a consistent 'image') instead (r5 review)."""
    paths, labels = jpeg_dir
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0 definitely not a jpeg")
    loader = NativeImageLoader(
        [str(bad)] + paths[:3], [9, *labels[:3]], out_size=16, resize_size=20,
        batch_size=4, num_threads=2, mode="eval",
    )
    (batch,) = list(loader)
    # eval order preserved: sample 0 is the corrupt one
    np.testing.assert_array_equal(batch["image"][0], 0.5)
    # AddInverse consistency holds for the filler too: x + (1-x) == 1
    np.testing.assert_allclose(
        batch["image"][..., :3] + batch["image"][..., 3:], 1.0, atol=1e-6
    )
    assert np.isfinite(batch["image"]).all()
    assert float(np.abs(batch["image"][1]).max()) > 0.5  # real samples intact


@needs_native
def test_train_mode_shuffles_and_runs(jpeg_dir):
    paths, labels = jpeg_dir
    loader = NativeImageLoader(
        paths, labels, out_size=32, resize_size=40, batch_size=4, num_threads=2,
        mode="train", seed=7,
    )
    b1 = list(loader)
    loader.set_epoch(1)
    b2 = list(loader)
    assert len(b1) == len(b2) == 2
    l1 = np.concatenate([b["label"] for b in b1])
    l2 = np.concatenate([b["label"] for b in b2])
    assert sorted(l1.tolist()) == sorted(labels)[: len(l1)] or len(l1) == 8


@needs_native
def test_eval_order_under_contention(tmp_path, rng):
    """Reorder buffer: 8 threads racing over 16 batches must still emit
    submission order (round-1 bug: completion order leaked into batch order)."""
    from PIL import Image

    paths, labels = [], []
    for i in range(64):
        arr = (rng.random((40 + (i % 5) * 16, 48, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"s_{i}.jpg"
        Image.fromarray(arr).save(p, quality=90)
        paths.append(str(p))
        labels.append(i)
    for _ in range(3):  # repeat: thread scheduling is nondeterministic
        loader = NativeImageLoader(
            paths, labels, out_size=24, resize_size=28, batch_size=4,
            num_threads=8, mode="eval", prefetch_batches=6,
        )
        got = np.concatenate([b["label"] for b in loader])
        np.testing.assert_array_equal(got, np.arange(64))


@needs_native
def test_dataset_smaller_than_batch(jpeg_dir):
    """<1 batch of samples: single wraparound batch, no hang."""
    paths, labels = jpeg_dir
    loader = NativeImageLoader(
        paths[:3], labels[:3], out_size=16, resize_size=20, batch_size=4,
        num_threads=2, mode="eval",
    )
    batches = list(loader)
    assert len(batches) == 1
    np.testing.assert_array_equal(
        batches[0]["label"], np.asarray(labels[:3] + labels[:1])
    )


def test_shipped_binary_is_current(jpeg_dir, monkeypatch):
    """The temp-dir fixture build means the other tests never touch the
    CHECKED-IN .so — this one does: its ABI version must match the binding
    and it must still emit eval batches in submission order (guards against
    shipping a stale binary whose ABI was not bumped)."""
    import ctypes
    import pathlib

    import bcosification_tpu.data.native_loader as nl

    shipped = pathlib.Path(__file__).parents[1] / "native" / "libbcos_loader.so"
    assert shipped.exists()
    lib = ctypes.CDLL(str(shipped))
    lib.bcos_loader_abi_version.restype = ctypes.c_int
    assert lib.bcos_loader_abi_version() == nl._ABI_VERSION, (
        "checked-in native/libbcos_loader.so is stale: "
        "`make -B -C native` and commit the rebuilt binary"
    )

    monkeypatch.setattr(nl, "_LIB_PATHS", [shipped])
    monkeypatch.setattr(nl, "_lib", None)
    paths, labels = jpeg_dir
    loader = NativeImageLoader(
        paths, labels, out_size=16, resize_size=20, batch_size=4,
        num_threads=4, mode="eval",
    )
    got = np.concatenate([b["label"] for b in loader])
    np.testing.assert_array_equal(got, np.asarray(labels))
    nl._lib = None  # do not leak the shipped lib into other tests


@needs_native
def test_train_augmentation_deterministic_per_seed(jpeg_dir):
    """Augmentation draws are keyed per (seed, epoch, epoch-position), NOT
    per worker thread — two instances (even with different thread counts)
    must produce bit-identical batches, because multi-host replicated
    loading device_puts the batch to a multi-process mesh, which asserts
    host equality (docs/SCALING.md)."""
    paths, labels = jpeg_dir

    def grab(seed, threads, epoch=0):
        loader = NativeImageLoader(
            paths, labels, out_size=32, resize_size=40, batch_size=4,
            num_threads=threads, mode="train", seed=seed,
        )
        loader.set_epoch(epoch)
        return [b["image"].copy() for b in loader]

    a = grab(7, threads=1)
    b = grab(7, threads=4)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different seed and different epoch both change the draws
    c = grab(8, threads=4)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))
    d = grab(7, threads=4, epoch=1)
    assert any(not np.array_equal(x, y) for x, y in zip(a, d))

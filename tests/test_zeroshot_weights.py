"""Precomputed ImageNet zeroshot classifier path + error-narrowing tests.

Parity target: the reference's `get_imagenet_zeroshot_weights` —
`torch.load(IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH)` consumed by the per-epoch
ImageNet ZeroshotEval (`/root/reference/bcos/training/trainer.py:47-48,
1073-1087`) instead of re-encoding 80k prompts per epoch.
"""
import types

import numpy as np
import pytest

import jax.numpy as jnp

from bcosification_tpu import settings
from bcosification_tpu.training import zeroshot as zs_lib
from bcosification_tpu.training.trainer import Trainer

D = 16


def test_zeroshot_weights_roundtrip(tmp_path):
    w = np.random.default_rng(0).standard_normal((D, 10)).astype(np.float32)
    path = str(tmp_path / "zs.npy")
    zs_lib.save_zeroshot_weights(path, w)
    got = np.asarray(zs_lib.load_zeroshot_weights(path))
    np.testing.assert_allclose(got, w)


def test_zeroshot_weights_rejects_non_matrix(tmp_path):
    path = str(tmp_path / "bad.npy")
    np.save(path, np.zeros(7, np.float32))
    with pytest.raises(ValueError, match="D, C"):
        zs_lib.load_zeroshot_weights(path)


def _fake_imagenet_val(tmp_path, n_classes=2, n_imgs=2):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = tmp_path / "val" / f"class{c:03d}"
        d.mkdir(parents=True)
        for i in range(n_imgs):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpeg")


class _FakeEncoder:
    """Stands in for the student model: deterministic [B, D] features."""

    def apply(self, variables, x, train=False):
        pooled = x.mean(axis=(1, 2))  # [B, 6]
        return jnp.tile(pooled, (1, D // 4))[:, :D]


def test_precomputed_imagenet_classifier_is_used(tmp_path, monkeypatch):
    """With IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH set, the text tower must NOT
    be touched; the saved matrix drives the eval."""
    _fake_imagenet_val(tmp_path)
    w = np.random.default_rng(1).standard_normal((D, 1000)).astype(np.float32)
    wpath = str(tmp_path / "imagenet_zs.npy")
    zs_lib.save_zeroshot_weights(wpath, w)

    monkeypatch.setattr(settings, "DATA_ROOT", None)
    monkeypatch.setattr(settings, "IMAGENET_PATH", str(tmp_path))
    monkeypatch.setattr(settings, "IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH", wpath)
    monkeypatch.setattr(
        zs_lib,
        "zeroshot_classifier",
        lambda *a, **k: pytest.fail("text tower used despite precomputed weights"),
    )

    state = types.SimpleNamespace(params={}, batch_stats={})
    results = Trainer._maybe_zeroshot(None, _FakeEncoder(), state, None, None)
    assert "zeroshot_ImageNet_acc1" in results
    assert 0.0 <= results["zeroshot_ImageNet_acc1"] <= 1.0


def test_zeroshot_real_bug_propagates(tmp_path, monkeypatch):
    """An injected non-data bug must raise, not be reported as 'skipped'."""
    from bcosification_tpu.data.datamodules import ClassificationDataModule

    monkeypatch.setattr(settings, "DATA_ROOT", str(tmp_path))
    monkeypatch.setattr(settings, "IMAGENET_PATH", None)
    monkeypatch.setattr(settings, "IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH", None)

    def boom(*a, **k):
        raise RuntimeError("injected zeroshot bug")

    monkeypatch.setattr(ClassificationDataModule, "registry", classmethod(boom))
    state = types.SimpleNamespace(params={}, batch_stats={})
    with pytest.raises(RuntimeError, match="injected zeroshot bug"):
        Trainer._maybe_zeroshot(None, _FakeEncoder(), state, None, None)


def test_missing_data_still_skips(tmp_path, monkeypatch):
    """A FileNotFoundError from a missing dataset is still skippable."""
    monkeypatch.setattr(settings, "DATA_ROOT", None)
    monkeypatch.setattr(settings, "IMAGENET_PATH", str(tmp_path / "nope"))
    monkeypatch.setattr(settings, "IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH", None)
    state = types.SimpleNamespace(params={}, batch_stats={})
    results = Trainer._maybe_zeroshot(None, _FakeEncoder(), state, None, None)
    assert results == {}

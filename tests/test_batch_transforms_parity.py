"""Numerical parity of the batch-level collate transforms vs the reference.

RandomMixup / RandomCutmix / SplitAndGrid (`bcos/data/transforms.py:58-296`)
are the reference's batch augmentations (SplitAndGrid is the grid-pointing-
game training aug). Randomness is injected identically on both sides
(monkeypatched torch draws / stub numpy rng), then outputs must match
elementwise. Reference tensors are NCHW; ours NHWC.
"""
import numpy as np
import pytest

from bcosification_tpu.data import transforms as T

from reference_loader import (
    _stub_torchvision_presets,
    load_reference,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

B, C, H, W = 8, 3, 16, 16
NUM_CLASSES = 5


class _StubRng:
    """numpy Generator stand-in yielding predetermined draws."""

    def __init__(self, uniform=0.0, lam=0.3, ints=()):
        self._uniform = uniform
        self._lam = lam
        self._ints = list(ints)

    def random(self):
        return self._uniform

    def beta(self, a, b):
        return self._lam

    def integers(self, n):
        return self._ints.pop(0)


def _batch(rng):
    x = rng.random((B, C, H, W)).astype(np.float32)
    t = rng.integers(0, NUM_CLASSES, B).astype(np.int64)
    return x, t


def _ref_transforms():
    _stub_torchvision_presets()
    return load_reference("bcos.data.transforms")


def test_mixup_matches_reference(monkeypatch):
    import torch

    ref_mod = _ref_transforms()
    rng = np.random.default_rng(0)
    x, t = _batch(rng)
    lam = 0.37

    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(1))
    monkeypatch.setattr(
        torch, "_sample_dirichlet", lambda *a, **k: torch.tensor([lam, 1 - lam])
    )
    ref = ref_mod.RandomMixup(num_classes=NUM_CLASSES, p=0.5, alpha=1.0)
    want_x, want_t = ref(torch.from_numpy(x.copy()), torch.from_numpy(t.copy()))

    ours = T.RandomMixup(
        num_classes=NUM_CLASSES, p=0.5, alpha=1.0, rng=_StubRng(uniform=0.0, lam=lam)
    )
    got_x, got_t = ours(x.transpose(0, 2, 3, 1), t)

    np.testing.assert_allclose(
        got_x.transpose(0, 3, 1, 2), want_x.numpy(), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(got_t, want_t.numpy(), rtol=1e-6, atol=1e-7)


def test_mixup_skip_branch_matches_reference(monkeypatch):
    import torch

    ref_mod = _ref_transforms()
    rng = np.random.default_rng(1)
    x, t = _batch(rng)

    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.ones(1))
    ref = ref_mod.RandomMixup(num_classes=NUM_CLASSES, p=0.5)
    want_x, want_t = ref(torch.from_numpy(x.copy()), torch.from_numpy(t.copy()))

    ours = T.RandomMixup(num_classes=NUM_CLASSES, p=0.5, rng=_StubRng(uniform=0.99))
    got_x, got_t = ours(x.transpose(0, 2, 3, 1), t)

    np.testing.assert_allclose(got_x.transpose(0, 3, 1, 2), want_x.numpy())
    # skip branch still one-hots the target
    np.testing.assert_allclose(got_t, want_t.numpy())


def test_cutmix_matches_reference(monkeypatch):
    import torch

    ref_mod = _ref_transforms()
    rng = np.random.default_rng(2)
    x, t = _batch(rng)
    lam, r_x, r_y = 0.42, 5, 9

    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(1))
    monkeypatch.setattr(
        torch, "_sample_dirichlet", lambda *a, **k: torch.tensor([lam, 1 - lam])
    )
    draws = iter([r_x, r_y])
    monkeypatch.setattr(
        torch, "randint", lambda high, size: torch.tensor([next(draws)])
    )
    ref = ref_mod.RandomCutmix(num_classes=NUM_CLASSES, p=0.5, alpha=1.0)
    want_x, want_t = ref(torch.from_numpy(x.copy()), torch.from_numpy(t.copy()))

    ours = T.RandomCutmix(
        num_classes=NUM_CLASSES,
        p=0.5,
        alpha=1.0,
        rng=_StubRng(uniform=0.0, lam=lam, ints=[r_x, r_y]),
    )
    got_x, got_t = ours(x.transpose(0, 2, 3, 1), t)

    np.testing.assert_allclose(
        got_x.transpose(0, 3, 1, 2), want_x.numpy(), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(got_t, want_t.numpy(), rtol=1e-6, atol=1e-7)


def _make_grid_nrow2(x, nrow=2, padding=0):
    """Faithful torchvision make_grid for padding=0: row-major 2x2 tiling."""
    import torch

    assert padding == 0 and nrow == 2 and len(x) == 4
    top = torch.cat([x[0], x[1]], dim=-1)
    bottom = torch.cat([x[2], x[3]], dim=-1)
    return torch.cat([top, bottom], dim=-2)


@pytest.mark.parametrize("p_gridified", [0.5, 1.0])
def test_split_and_grid_matches_reference(monkeypatch, p_gridified):
    import torch

    ref_mod = _ref_transforms()
    # the stub torchvision provides no make_grid; substitute the exact
    # padding=0 tiling so the reference path (tiling + REAL torch bilinear
    # interpolate) runs unmodified
    monkeypatch.setattr(ref_mod, "make_grid", _make_grid_nrow2)

    rng = np.random.default_rng(3)
    x, t = _batch(rng)
    ref = ref_mod.SplitAndGrid(p_gridified=p_gridified, num_classes=NUM_CLASSES)
    want_x, want_t = ref(torch.from_numpy(x.copy()), torch.from_numpy(t.copy()))

    ours = T.SplitAndGrid(p_gridified=p_gridified, num_classes=NUM_CLASSES)
    got_x, got_t = ours(x.transpose(0, 2, 3, 1), t)

    np.testing.assert_allclose(
        got_x.transpose(0, 3, 1, 2), want_x.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(got_t, want_t.numpy(), rtol=1e-6, atol=1e-7)

"""Numerical LR-schedule parity vs the reference factory.

The reference's `bcos/optim/lr_scheduler_factory.py` composes torch
StepLR / CosineAnnealingLR / ExponentialLR with LinearLR / ConstantLR warmup
via SequentialLR, stepped per-epoch or per-step. Our factory expresses the
same schedule as a pure function of the optimizer step. These tests build
BOTH on identical hyperparameters and compare the learning rate over the
entire training horizon.
"""
import numpy as np
import pytest

from bcosification_tpu.optim import LRSchedulerFactory

from reference_loader import (
    _stub_torchmetrics_and_lightning,
    load_reference,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

BASE_LR = 0.1
EPOCHS = 12
SPE = 7  # steps per epoch


def _ref_factory(**kwargs):
    _stub_torchmetrics_and_lightning()
    mod = load_reference("bcos.optim.lr_scheduler_factory")
    return mod.LRSchedulerFactory(**kwargs)


def _torch_lrs(ref, interval, n_scheduler_steps):
    import torch

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=BASE_LR)
    created = ref.create(opt, total_steps=EPOCHS * SPE if interval == "step" else None)
    sched = created["scheduler"] if isinstance(created, dict) else created
    lrs = []
    for _ in range(n_scheduler_steps):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


CASES = [
    dict(name="cosineannealinglr", epochs=EPOCHS),
    dict(name="cosineannealinglr", epochs=EPOCHS, lr_min=0.01),
    dict(
        name="cosineannealinglr",
        epochs=EPOCHS,
        warmup_epochs=3,
        warmup_method="linear",
        warmup_decay=0.01,
    ),
    dict(
        name="cosineannealinglr",
        epochs=EPOCHS,
        warmup_epochs=2,
        warmup_method="constant",
        warmup_decay=0.1,
    ),
    dict(name="steplr", step_size=4, gamma=0.2),
    dict(name="exponentiallr", gamma=0.9),
    dict(
        name="cosineannealinglr",
        epochs=EPOCHS,
        interval="step",
        warmup_steps=11,
        warmup_method="linear",
        warmup_decay=0.01,
    ),
    dict(name="cosineannealinglr", epochs=EPOCHS, interval="step"),
    dict(name="steplr", step_size=4, epochs=EPOCHS, gamma=0.2, interval="step"),
    dict(
        name="cosineannealinglr",
        epochs=EPOCHS,
        interval="step",
        warmup_epochs=2,
        warmup_method="linear",
        warmup_decay=0.05,
    ),
]


@pytest.mark.parametrize("kwargs", CASES, ids=lambda k: "-".join(f"{a}={v}" for a, v in k.items()))
def test_lr_curve_matches_reference(kwargs):
    interval = kwargs.get("interval", "epoch")
    ref = _ref_factory(**kwargs)
    ours = LRSchedulerFactory(**kwargs).create(BASE_LR, SPE)

    if interval == "epoch":
        want = _torch_lrs(ref, interval, EPOCHS)
        # our schedule is a function of the global optimizer step; within an
        # epoch the factor is constant and equals torch's lr for that epoch
        got = np.array([float(ours(e * SPE)) for e in range(EPOCHS)])
        got_mid = np.array([float(ours(e * SPE + SPE - 1)) for e in range(EPOCHS)])
        np.testing.assert_allclose(got_mid, got, rtol=0, atol=0)
    else:
        want = _torch_lrs(ref, interval, EPOCHS * SPE)
        got = np.array([float(ours(t)) for t in range(EPOCHS * SPE)])
    # our schedule evaluates in float32; torch's in float64
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)

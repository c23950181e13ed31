"""Differential oracle: b:1->2 interpolation schedule vs the reference's hook.

The reference implements b-interpolation as a gradient hook that overwrites
the learnable-b gradient with ``-batch_size`` while b < b_at_end and zeroes
it from the first backward where b >= b_at_end
(/root/reference/bcos/training/hooks.py:7-23), stepped every batch by a
dedicated ``SGD(lr=b_lr * num_gpus)``
(/root/reference/bcos/training/bcosify_trainer.py:88-107). The framework
replaces that machinery with the closed-form
``training.steps.make_linear_b_schedule``; these tests drive the reference's
OWN Hook + torch SGD and assert the b(t) trajectories match step for step —
including the lr x world scaling and the freeze-on-crossing overshoot.

The ``b_loss`` variant (real loss gradients into an SGD with momentum +
weight decay over ONLY the b leaves, bcosify_trainer.py:100-105) is covered
by driving identical gradient sequences through torch SGD and through the
masked b-optimizer the trainer builds (OptimizerFactory b_opt=True).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import reference_loader
from bcosification_tpu.optim import OptimizerFactory
from bcosification_tpu.training.steps import make_linear_b_schedule


def _reference_b_trajectory(steps, b_at_start, b_at_end, b_lr, num_gpus, batch_size):
    """b after each of `steps` optimizer steps, using the reference's Hook."""
    reference_loader._stub_torchvision()
    hooks = reference_loader.load_reference("bcos.training.hooks")

    mod = torch.nn.Module()
    # trainer.py:463: b initialised at b_at_start + 1e-6 as an nn.Parameter
    mod.b = torch.nn.Parameter(torch.tensor(float(b_at_start) + 1e-6))
    # forward_hook_fn (hooks.py:26-36) records the module input's batch dim
    mod.batch_size = batch_size
    mod.b.register_hook(hooks.Hook(mod, start=b_at_start, end=b_at_end))
    # bcosify_trainer.py:95-98: SGD over the b params, lr scaled by num_gpus
    opt = torch.optim.SGD([mod.b], lr=b_lr * num_gpus)
    out = []
    for _ in range(steps):
        opt.zero_grad()
        # any loss touching b — the hook overwrites the gradient anyway
        (mod.b * 3.7).backward()
        opt.step()
        out.append(float(mod.b.detach()))
    return np.asarray(out)


CASES = [
    # (b_at_start, b_at_end, b_lr, num_gpus, batch_size, steps)
    (1, 2, 1e-4, 1, 64, 40),  # the reference defaults, mid-trajectory
    (1, 2, 1e-4, 4, 16, 40),  # lr x num_gpus scaling (same global batch)
    (1, 2, 0.01, 4, 2, 20),  # crosses b_at_end at step 13, then frozen
    (1.5, 2.5, 0.02, 1, 8, 15),  # non-default start/end, crossing at 7
]


@pytest.mark.parametrize("start,end,b_lr,world,batch,steps", CASES)
def test_linear_b_matches_reference_hook(start, end, b_lr, world, batch, steps):
    ref = _reference_b_trajectory(steps, start, end, b_lr, world, batch)
    sched = make_linear_b_schedule(
        b_at_start=start, b_at_end=end, b_lr=b_lr, world_size=world, batch_size=batch
    )
    # the train step applies b = schedule(state.step) BEFORE the forward, so
    # schedule(k) is the b value in effect after k reference optimizer steps
    ours = np.asarray([float(sched(k)) for k in range(1, steps + 1)])
    # closed form (one multiply) vs torch's iterated fp32 accumulation
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-6)
    # the b used on the very first forward is the reference's init value
    # (both sides store it as fp32)
    assert float(sched(0)) == pytest.approx(float(np.float32(start + 1e-6)), abs=1e-9)


def test_linear_b_freeze_crossing_is_exact():
    """The crossing step index and the frozen (overshot) value must match."""
    start, end, b_lr, world, batch, steps = 1, 2, 0.01, 4, 2, 25
    delta = b_lr * world * batch  # 0.08
    ref = _reference_b_trajectory(steps, start, end, b_lr, world, batch)
    sched = make_linear_b_schedule(
        b_at_start=start, b_at_end=end, b_lr=b_lr, world_size=world, batch_size=batch
    )
    ref_cross = int(np.argmax(ref >= end)) + 1  # step count at first b >= end
    assert ref_cross == 13  # ceil((1 - 1e-6) / 0.08)
    ours = np.asarray([float(sched(k)) for k in range(1, steps + 1)])
    our_cross = int(np.argmax(ours >= end)) + 1
    assert our_cross == ref_cross
    # frozen value overshoots to start + 1e-6 + K*delta and STAYS there
    assert np.all(ref[ref_cross - 1 :] == ref[ref_cross - 1])
    assert np.all(ours[our_cross - 1 :] == ours[our_cross - 1])
    np.testing.assert_allclose(
        ours[our_cross - 1], start + 1e-6 + 13 * delta, atol=5e-6
    )


def test_linear_b_already_past_end_never_moves():
    """Hook zeroes the gradient from the first backward when b >= end."""
    ref = _reference_b_trajectory(5, b_at_start=2, b_at_end=2, b_lr=0.1, num_gpus=1, batch_size=8)
    sched = make_linear_b_schedule(
        b_at_start=2, b_at_end=2, b_lr=0.1, world_size=1, batch_size=8
    )
    ours = np.asarray([float(sched(k)) for k in range(1, 6)])
    np.testing.assert_allclose(ours, ref, atol=1e-7)
    assert np.all(ref == ref[0])


def test_b_loss_sgd_matches_reference_b_optimizer():
    """b_loss variant: SGD(momentum, weight_decay) over ONLY the b leaves
    (bcosify_trainer.py:100-105 — note: no num_gpus scaling on this path),
    driven by real loss gradients. Same gradient sequence through torch and
    through the trainer's masked b-optimizer must give the same b path and
    leave non-b params untouched."""
    lr, momentum, wd, steps = 0.05, 0.9, 1e-4, 12
    rng = np.random.default_rng(0)
    b0 = 1.37
    grads_b = rng.normal(size=steps).astype(np.float32)

    # --- torch: the reference's b_optimizer on a scalar b parameter
    b = torch.nn.Parameter(torch.tensor(b0))
    opt = torch.optim.SGD([b], lr=lr, momentum=momentum, weight_decay=wd)
    ref_path = []
    for g in grads_b:
        opt.zero_grad()
        b.grad = torch.tensor(g)
        opt.step()
        ref_path.append(float(b.detach()))

    # --- ours: OptimizerFactory(b_opt=True) masks to the b leaves
    params = {
        "conv": {"weight": jnp.ones((2, 2)), "b": jnp.asarray(b0, jnp.float32)},
        "head": {"kernel": jnp.full((3,), 2.0)},
    }
    fac = OptimizerFactory("sgd", lr, momentum=momentum, weight_decay=wd)
    b_tx = fac.with_args(bcosify=True, b_opt=True).create(lr, params)
    state = b_tx.init(params)
    our_path = []
    for g in grads_b:
        full_grads = {
            "conv": {"weight": jnp.full((2, 2), 9.9), "b": jnp.asarray(g)},
            "head": {"kernel": jnp.full((3,), -9.9)},
        }
        updates, state = b_tx.update(full_grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        our_path.append(float(params["conv"]["b"]))
        # the masked optimizer must not move anything except the b leaves
        np.testing.assert_array_equal(np.asarray(params["conv"]["weight"]), 1.0)
        np.testing.assert_array_equal(np.asarray(params["head"]["kernel"]), 2.0)

    np.testing.assert_allclose(np.asarray(our_path), np.asarray(ref_path), atol=1e-6)

"""Numerical optimizer-update parity vs torch.

The reference creates torch Adam/AdamW/SGD/RMSprop via its OptimizerFactory
(`bcos/optim/optimizer_factory.py:69-92`). Our factory builds the optax
equivalents; these tests run identical parameter/gradient trajectories
through both and assert the parameter paths match step for step — including
the semantic corners (coupled L2 for Adam/SGD, decoupled wd for AdamW,
torch's eps-outside-sqrt RMSprop, momentum, betas).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from bcosification_tpu.optim import OptimizerFactory

LR = 0.05
STEPS = 12


CASES = [
    ("adam", {}),
    ("adam", {"betas": (0.8, 0.95), "eps": 1e-6}),
    ("adam", {"weight_decay": 0.01}),  # coupled L2 (torch warns but applies)
    ("adamw", {"weight_decay": 0.05}),
    ("adamw", {"weight_decay": 0.05, "betas": (0.85, 0.98)}),
    ("sgd", {}),
    ("sgd", {"momentum": 0.9}),
    ("sgd", {"momentum": 0.9, "nesterov": True}),
    ("sgd", {"momentum": 0.9, "weight_decay": 0.01}),
    ("rmsprop", {}),
    ("rmsprop", {"momentum": 0.9, "alpha": 0.95, "eps": 1e-2}),
]


def _torch_trajectory(name, kwargs, p0, grads):
    import torch

    p = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    cls = {
        "adam": torch.optim.Adam,
        "adamw": torch.optim.AdamW,
        "sgd": torch.optim.SGD,
        "rmsprop": torch.optim.RMSprop,
    }[name]
    if name == "rmsprop":
        # the reference factory injects these defaults before building the
        # torch optimizer (optimizer_factory.py:75-76); ours does the same
        kwargs = {"eps": 0.0316, "alpha": 0.9, **kwargs}
    opt = cls([p], lr=LR, **kwargs)
    out = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
        out.append(p.detach().numpy().copy())
    return np.stack(out)


def _ours_trajectory(name, kwargs, p0, grads):
    import optax

    # reference config spelling: alpha/eps for rmsprop, betas for adam(w)
    fac = OptimizerFactory(name=name, lr=LR, **kwargs)
    tx = fac.create(LR)
    params = jnp.asarray(p0)
    state = tx.init(params)
    out = []
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
        out.append(np.asarray(params))
    return np.stack(out)


@pytest.mark.parametrize(
    "name,kwargs", CASES, ids=[f"{n}-{list(k)}" for n, k in CASES]
)
def test_update_trajectory_matches_torch(name, kwargs):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(6).astype(np.float32)
    grads = [rng.standard_normal(6).astype(np.float32) for _ in range(STEPS)]
    want = _torch_trajectory(name, kwargs, p0, grads)
    got = _ours_trajectory(name, kwargs, p0, grads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

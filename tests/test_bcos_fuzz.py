"""Seeded fuzz: random BcosConv2d configurations (kernel/stride/padding/
DILATION/groups/max_out/b/explain drawn jointly) vs the torch reference —
values and input gradients. The parametrized grid in test_bcos_ops.py covers
the named paths; this sweeps the cross-products it doesn't, in particular
dilated+grouped and dilated+strided combinations (the reference's
`_calc_patch_norms_slow` territory, bcosconv2d.py:233-250)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.ops import bcos as ops

from reference_loader import load_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

N_CASES = 10


def _draw_case(rng):
    ks = int(rng.choice([1, 2, 3, 5]))
    max_out = int(rng.choice([1, 2]))
    # dilation+max_out is untestable: the reference's own dilated norm path
    # (_calc_patch_norms_slow, ones_like(weight)) emits O*max_out channels
    # and crashes against the post-MaxOut O-channel output
    dilation = int(rng.choice([1, 2, 3])) if ks > 1 and max_out == 1 else 1
    stride = int(rng.choice([1, 2]))
    eff = dilation * (ks - 1) + 1
    padding = int(rng.integers(0, eff // 2 + 1))
    groups = int(rng.choice([1, 2, 4]))
    in_ch = groups * int(rng.choice([2, 3]))
    out_per_group = int(rng.choice([1, 2])) * groups
    b = float(rng.choice([1.0, 1.5, 2.0, 2.5]))
    explain = bool(rng.integers(0, 2))
    size = int(rng.integers(eff, eff + 7))
    return dict(
        ks=ks, stride=stride, padding=padding, dilation=dilation, groups=groups,
        in_ch=in_ch, out_ch=out_per_group, max_out=max_out, b=b,
        explain=explain, size=size,
    )


@needs_reference
@pytest.mark.parametrize("case_idx", range(N_CASES))
def test_bcos_conv2d_fuzz_vs_torch(case_idx):
    import torch

    rng = np.random.default_rng(1234 + case_idx)
    c = _draw_case(rng)

    ref = load_reference("bcos.modules.bcosconv2d")
    tmod = ref.BcosConv2d(
        c["in_ch"], c["out_ch"], kernel_size=c["ks"], stride=c["stride"],
        padding=c["padding"], dilation=c["dilation"], groups=c["groups"],
        b=c["b"], max_out=c["max_out"],
    )
    w = rng.standard_normal(
        (c["ks"], c["ks"], c["in_ch"] // c["groups"], c["out_ch"] * c["max_out"])
    ).astype(np.float32)
    with torch.no_grad():
        tmod.linear.weight.copy_(
            torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
        )

    x = rng.standard_normal((2, c["in_ch"], c["size"], c["size"])).astype(np.float32)
    if c["explain"] and hasattr(tmod, "set_explanation_mode"):
        tmod.set_explanation_mode(True)
    xt = torch.from_numpy(x).requires_grad_(True)
    t_out = tmod(xt)
    t_out.sum().backward()
    t_out_np, t_grad_np = t_out.detach().numpy(), xt.grad.detach().numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    kw = dict(
        b=c["b"], stride=c["stride"], padding=c["padding"],
        dilation=c["dilation"], groups=c["groups"], max_out=c["max_out"],
        explain=c["explain"],
    )
    j_out = ops.bcos_conv2d(x_nhwc, jnp.asarray(w), **kw)
    j_grad = jax.grad(lambda xx: ops.bcos_conv2d(xx, jnp.asarray(w), **kw).sum())(
        x_nhwc
    )

    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out_np, rtol=1e-4, atol=1e-5,
        err_msg=f"values diverged for {c}",
    )
    np.testing.assert_allclose(
        np.asarray(j_grad).transpose(0, 3, 1, 2), t_grad_np, rtol=1e-4, atol=1e-5,
        err_msg=f"input-grads diverged for {c}",
    )

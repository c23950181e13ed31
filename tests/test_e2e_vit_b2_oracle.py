"""End-to-end b=2 differential for the bcosified ViT family.

Runs the reference's ACTUAL ViT conversion — root `bcosify_vit.py`
BcosifyNetwork over a *standard* SimpleViT (torch layers, the shape
`torch.hub B-cos/B-cos-v2 standard_*` returns) with the production recipe
(b=2, biases nulled, GELU->MyGELU, LN->DetachableLayerNorm, patch-linear
channel doubling, `/root/reference/bcos/experiments/ImageNet/
vit_bcosification/model.py:7-31`) — imports the same pre-conversion
state_dict through `bcosify/torch_import.simple_vit_torch_to_variables`, and
asserts logits and explain-mode W(x) match end-to-end. Covers both head
orders (gap_reorder False/True — the reference's `gapReorder` config axis).
"""
import math
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reference_loader import (  # noqa: E402
    load_reference,
    load_reference_bcosify_vit,
    reference_available,
)

from bcosification_tpu.bcosify.torch_import import simple_vit_torch_to_variables  # noqa: E402
from bcosification_tpu.explain import core as E  # noqa: E402
from bcosification_tpu.models import vit as vit_lib  # noqa: E402
from bcosification_tpu.models.bcosify_net import BcosifyNetwork  # noqa: E402
from bcosification_tpu.modules import BcosifyLinear, DetachableGELU, norms  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

DIM, DEPTH, HEADS, MLP, IMG, PATCH, NC = 32, 2, 2, 64, 16, 8, 5


def _std_vit_torch():
    ref_vit = load_reference("bcos.models.vit")
    torch.manual_seed(0)
    return ref_vit.SimpleViT(
        image_size=IMG, patch_size=PATCH, num_classes=NC, dim=DIM, depth=DEPTH,
        heads=HEADS, mlp_dim=MLP, channels=3,
        linear_layer=tnn.Linear, norm_layer=tnn.LayerNorm, act_layer=tnn.GELU,
    )


MODEL_CONFIG = {
    "name": "tiny_vit",
    "weights": "RANDOM_TEST",
    "args": {},
    "bcosify_args": {"use_bias": False},
    "bcos_args": {"b": 2},
    "act_layer": True,
    "logit_layer": True,
    "logit_bias": -math.log(NC - 1),
    "is_bcos": True,
}


def _build_mine(sd, gap_reorder):
    backbone = vit_lib.SimpleViT(
        image_size=IMG, patch_size=PATCH, num_classes=NC, dim=DIM, depth=DEPTH,
        heads=HEADS, mlp_dim=MLP,
        linear_layer=partial(BcosifyLinear, b=2, use_bias=False),
        norm_layer=norms.NoBias(norms.DetachableLayerNorm),
        act_layer=DetachableGELU,
        qkv_layer=vit_lib.PlainLinear,  # to_qkv stays plain (bcosify_vit.py:138)
        gap_reorder=gap_reorder,
        name="model",
    )
    net = BcosifyNetwork(
        model=backbone, num_classes=NC, with_logit_layer=True,
        logit_bias=MODEL_CONFIG["logit_bias"],
    )
    x0 = jnp.zeros((1, IMG, IMG, 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    variables = simple_vit_torch_to_variables(
        abstract, sd, DEPTH, add_channels=True, use_bias=False
    )
    return net, variables


@pytest.fixture(scope="module", params=[False, True], ids=["mean-head", "gap-reorder"])
def vit_oracle(request):
    gap_reorder = request.param
    tmodel = _std_vit_torch()
    sd = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    ref_mod = load_reference_bcosify_vit()
    ref = ref_mod.BcosifyNetwork(
        tmodel, MODEL_CONFIG, add_channels=True, logit_layer=True
    )
    for mod in ref.modules():  # vit factory nulling (model.py:19-24)
        if hasattr(mod, "bias") and mod.bias is not None:
            mod.bias = None
    if gap_reorder:
        ref.model.gap_reorder = True
    ref.eval()

    net, variables = _build_mine(sd, gap_reorder)
    rng = np.random.default_rng(11)
    x = rng.random((2, 3, IMG, IMG)).astype(np.float32)
    x6 = np.concatenate([x, 1.0 - x], axis=1)
    return ref, net, variables, x6


def test_vit_b2_e2e_logits(vit_oracle):
    ref, net, variables, x6 = vit_oracle
    with torch.no_grad():
        want = ref(torch.from_numpy(x6)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x6.transpose(0, 2, 3, 1))))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * scale)


def test_vit_b2_e2e_explain_W(vit_oracle):
    ref, net, variables, x6 = vit_oracle
    idx = 3
    xt = torch.from_numpy(x6[:1]).clone().requires_grad_(True)
    t_res = ref.explain(xt, idx=idx)
    t_W = t_res["dynamic_linear_weights"].detach().numpy()[0].transpose(1, 2, 0)

    j_res = E.explain(net, variables, jnp.asarray(x6[:1].transpose(0, 2, 3, 1)), idx=idx)
    j_W = np.asarray(j_res["dynamic_linear_weights"][0])

    assert j_res["prediction"] == int(t_res["prediction"])
    scale = max(np.abs(t_W).max(), 1e-6)
    np.testing.assert_allclose(j_W, t_W, rtol=1e-4, atol=1e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(j_res["contribution_map"][0]),
        t_res["contribution_map"].detach().numpy()[0],
        rtol=1e-4,
        atol=1e-5 * max(float(np.abs(t_res["contribution_map"].detach().numpy()).max()), 1e-6),
    )

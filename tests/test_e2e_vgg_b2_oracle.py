"""End-to-end b=2 differential for the from-scratch B-cos VGG (L2).

Locks `models/vgg.py` against the reference's `bcos/models/vgg.py`
(make_layers conv/BNU stacks with AvgPool 'M' entries, the hardcoded
512->4096 7x7 + 4096->4096 + 4096->NC classifier applied BEFORE global
average pooling, LogitLayer) — logits and explain-mode W(x). Uses a tiny
custom letter config ending at 512 channels (the classifier input width the
reference hardcodes, vgg.py:46-57); the 4096-wide classifier is exercised at
1x1 spatial so the test stays CPU-cheap despite ~500 MB of weights per side.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_loader import (  # noqa: E402
    load_reference,
    load_reference_from_scratch_models,
    reference_available,
)

from bcosification_tpu.explain import core as E  # noqa: E402
from bcosification_tpu.models import vgg as vgg_lib  # noqa: E402
from bcosification_tpu.modules import norms as my_norms  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

NC, INPUT = 7, 16
TINY_CFG = [16, "M", 32, "M", 512, "M", 512, "M"]  # /16 -> 1x1 at INPUT=16


def _build_ref():
    load_reference_from_scratch_models()
    mod = load_reference("bcos.models.vgg")
    import sys

    ref_norms = sys.modules["bcos.modules.norms"]
    bcosconv = sys.modules["bcos.modules"].BcosConv2d
    torch.manual_seed(0)
    features = mod.make_layers(
        TINY_CFG,
        norm_layer=ref_norms.NoBias(ref_norms.BatchNormUncentered2d),
        conv_layer=bcosconv,
        in_channels=6,
    )
    ref = mod.BcosVGG(
        features, num_classes=NC, init_weights=True, conv_layer=bcosconv
    )
    # carry real scale through the stack (random b=2 nets contract, CLAUDE.md)
    rng = np.random.default_rng(5)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            if p.ndim == 1:  # BNU gammas
                p.copy_(
                    torch.from_numpy(
                        ((rng.random(p.shape[0]) + 0.5) * 4.0).astype(np.float32)
                    )
                )
        for m in ref.modules():
            rv = getattr(m, "running_var", None)
            if rv is not None:
                rv.copy_(
                    torch.from_numpy(
                        (rng.random(rv.shape[0]) + 0.5).astype(np.float32)
                    )
                )
    ref = ref.eval()
    # Calibrate the BNU gammas so the pre-logit magnitude is O(1) (CLAUDE.md:
    # random b=2 nets contract; the unnormalised 4096-wide classifier alone
    # eats ~1e-9). The whole net is 1-homogeneous in activations, so scaling
    # every gamma by s scales the output by s^n_norms — solve exactly.
    probe = torch.from_numpy(
        np.random.default_rng(11).random((1, 6, INPUT, INPUT)).astype(np.float32)
    )
    with torch.no_grad():
        gammas = [p for _, p in ref.named_parameters() if p.ndim == 1]
        m = float(ref.classifier(ref.features(probe)).abs().max())
        s = (0.5 / m) ** (1.0 / len(gammas))
        for p in gammas:
            p.mul_(s)
    return ref


def _fill_from_ref(abstract, ref):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # our features_{i} skips pool entries; the reference Sequential counts them
    n_convs = sum(1 for v in TINY_CFG if v != "M")
    ours_to_ref = {}
    ref_idx = our_idx = 0
    for v in TINY_CFG:
        if v == "M":
            ref_idx += 1  # AvgPool2d consumes a Sequential slot
            continue
        ours_to_ref[f"features_{our_idx}"] = f"features.{ref_idx}"  # conv
        ours_to_ref[f"features_{our_idx + 1}"] = f"features.{ref_idx + 1}"  # norm
        our_idx += 2
        ref_idx += 2
    assert our_idx == 2 * n_convs
    for i in range(3):
        ours_to_ref[f"classifier_{i}"] = f"classifier.{i}"

    def fill(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        coll, scope, name = keys[0], keys[1:-1], keys[-1]
        tp = ours_to_ref[scope[0]]
        if coll == "batch_stats":
            if name == "num_batches_tracked":
                return jnp.zeros(leaf.shape, leaf.dtype)
            return jnp.asarray(sd[f"{tp}.{name}"])
        if name == "weight" and leaf.ndim == 4:  # conv HWIO <- OIHW
            return jnp.asarray(np.transpose(sd[f"{tp}.linear.weight"], (2, 3, 1, 0)))
        return jnp.asarray(sd[f"{tp}.{name}"])  # norm affine weight

    return jax.tree_util.tree_map_with_path(fill, abstract)


@pytest.fixture(scope="module")
def vgg():
    ref = _build_ref()
    vgg_lib.CFGS["TINY_ORACLE"] = TINY_CFG  # apply-time lookup; removed below
    net = vgg_lib.BcosVGG(
        cfg="TINY_ORACLE",
        num_classes=NC,
        norm_layer=my_norms.NoBias(my_norms.BatchNormUncentered2d),
        with_norm=True,
    )
    x0 = jnp.zeros((1, INPUT, INPUT, 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    variables = _fill_from_ref(abstract, ref)
    rng = np.random.default_rng(2)
    x = rng.random((2, 6, INPUT, INPUT)).astype(np.float32)
    x[:, 3:] = 1.0 - x[:, :3]  # AddInverse-consistent encoding
    with torch.no_grad():
        pre = ref(torch.from_numpy(x)) + float(np.log(NC - 1))
    assert float(pre.abs().max()) > 1e-3  # non-degeneracy guard
    yield ref, net, variables, x
    vgg_lib.CFGS.pop("TINY_ORACLE", None)


def test_vgg_b2_logits(vgg):
    ref, net, variables, x = vgg
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = max(np.abs(want + np.log(NC - 1)).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * max(scale, 1.0))


def test_vgg_b2_explain_W(vgg):
    ref, net, variables, x = vgg
    idx = 3
    xt = torch.from_numpy(x[:1]).clone().requires_grad_(True)
    t_res = ref.explain(xt, idx=idx)
    t_W = t_res["dynamic_linear_weights"].detach().numpy()[0].transpose(1, 2, 0)

    j_res = E.explain(net, variables, jnp.asarray(x[:1].transpose(0, 2, 3, 1)), idx=idx)
    j_W = np.asarray(j_res["dynamic_linear_weights"][0])
    assert j_res["prediction"] == int(t_res["prediction"])
    scale = max(np.abs(t_W).max(), 1e-9)
    np.testing.assert_allclose(j_W, t_W, rtol=1e-4, atol=1e-5 * scale)

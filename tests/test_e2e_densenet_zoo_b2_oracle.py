"""End-to-end b=2 differential for the from-scratch B-cos DenseNet (L2).

Locks `models/densenet.py` (the zoo variant: PosNorm default, AvgPool stem,
Identity acts, conv classifier BEFORE global average pooling, LogitLayer)
against the reference's `bcos/models/densenet.py` — logits and explain-mode
W(x), for both the reference-default NoBias(DetachablePositionNorm2d) and
NoBias(BatchNormUncentered2d). The bcosified-conversion DenseNet path has
its own oracle (test_e2e_densenet_b2_oracle); this covers the dense-concat /
transition semantics of the from-scratch model code itself.
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
from bcosification_tpu.models import densenet as densenet_lib  # noqa: E402
from bcosification_tpu.modules import BcosConv2d, Identity  # noqa: E402
from bcosification_tpu.modules import norms as my_norms  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

NC, INPUT = 7, 32
GROWTH, BLOCKS, INIT_F, BN_SIZE = 8, (2, 2), 16, 2


def _build_ref(norm_kind):
    load_reference_from_scratch_models()
    mod = load_reference("bcos.models.densenet")
    import sys

    ref_norms = sys.modules["bcos.modules.norms"]
    norm = (
        ref_norms.NoBias(ref_norms.BatchNormUncentered2d)
        if norm_kind == "bnu"
        else ref_norms.NoBias(ref_norms.DetachablePositionNorm2d)
    )
    torch.manual_seed(0)
    ref = mod.BcosDenseNet(
        growth_rate=GROWTH,
        block_config=BLOCKS,
        num_init_features=INIT_F,
        bn_size=BN_SIZE,
        num_classes=NC,
        norm_layer=norm,
    )
    rng = np.random.default_rng(5)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            if p.ndim == 1:  # norm gammas
                p.copy_(
                    torch.from_numpy(
                        ((rng.random(p.shape[0]) + 0.5)).astype(np.float32)
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
    # iterative gamma calibration to O(1) pre-logit signal (CLAUDE.md:
    # random b=2 nets contract; dense-concat paths pass different numbers of
    # norms, so the exact s^n solve of the VGG oracle doesn't apply — double
    # until the probe magnitude clears the fp32 floor against the logit bias)
    probe = torch.from_numpy(
        np.random.default_rng(11).random((1, 6, INPUT, INPUT)).astype(np.float32)
    )
    with torch.no_grad():
        gammas = [p for _, p in ref.named_parameters() if p.ndim == 1]
        for _ in range(60):
            m = float(ref.classifier(ref.act(ref.features(probe))).abs().max())
            if m > 0.05:
                break
            for p in gammas:
                p.mul_(2.0)
        assert m > 0.05, f"calibration failed, probe magnitude {m}"
    return ref


def _fill_from_ref(abstract, ref):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def tpath(scope):
        out = []
        for s in scope:
            if s.startswith("denseblock"):
                i, j = s.split("_")
                out.append(f"features.{i}.{j}")
            elif s.startswith("transition"):
                out.append(f"features.{s}")
            elif s in ("conv0", "norm0", "norm5"):
                out.append(f"features.{s}")
            else:
                out.append(s)  # norm1/conv1/norm2/conv2/norm/conv/classifier
        return ".".join(out)

    def fill(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        coll, scope, name = keys[0], keys[1:-1], keys[-1]
        tp = tpath(scope)
        if coll == "batch_stats":
            if name == "num_batches_tracked":
                return jnp.zeros(leaf.shape, leaf.dtype)
            return jnp.asarray(sd[f"{tp}.{name}"])
        if name == "weight" and leaf.ndim == 4:  # conv HWIO <- OIHW
            return jnp.asarray(np.transpose(sd[f"{tp}.linear.weight"], (2, 3, 1, 0)))
        return jnp.asarray(sd[f"{tp}.{name}"])  # norm affine weight

    return jax.tree_util.tree_map_with_path(fill, abstract)


def _build_mine(ref, norm_kind):
    norm = (
        my_norms.NoBias(my_norms.BatchNormUncentered2d)
        if norm_kind == "bnu"
        else my_norms.NoBias(my_norms.DetachablePositionNorm2d)
    )
    net = densenet_lib.BcosDenseNet(
        growth_rate=GROWTH,
        block_config=BLOCKS,
        num_init_features=INIT_F,
        bn_size=BN_SIZE,
        num_classes=NC,
        norm_layer=norm,
        conv_layer=BcosConv2d,
        act_layer=Identity,
        stem_pool="avg",
        gap_reorder=True,
        with_logit_layer=True,
    )
    x0 = jnp.zeros((1, INPUT, INPUT, 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    return net, _fill_from_ref(abstract, ref)


@pytest.fixture(scope="module", params=["posnorm", "bnu"])
def dnet(request):
    ref = _build_ref(request.param)
    net, variables = _build_mine(ref, request.param)
    rng = np.random.default_rng(2)
    x = rng.random((2, 6, INPUT, INPUT)).astype(np.float32)
    x[:, 3:] = 1.0 - x[:, :3]  # AddInverse-consistent encoding
    with torch.no_grad():
        pre = ref(torch.from_numpy(x)) + float(np.log(NC - 1))
    assert float(pre.abs().max()) > 1e-3  # non-degeneracy guard
    return ref, net, variables, x


def test_densenet_zoo_b2_logits(dnet):
    ref, net, variables, x = dnet
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = max(np.abs(want + np.log(NC - 1)).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * max(scale, 1.0))


def test_densenet_zoo_b2_explain_W(dnet):
    ref, net, variables, x = dnet
    idx = 3
    xt = torch.from_numpy(x[:1]).clone().requires_grad_(True)
    t_res = ref.explain(xt, idx=idx)
    t_W = t_res["dynamic_linear_weights"].detach().numpy()[0].transpose(1, 2, 0)

    j_res = E.explain(net, variables, jnp.asarray(x[:1].transpose(0, 2, 3, 1)), idx=idx)
    j_W = np.asarray(j_res["dynamic_linear_weights"][0])
    assert j_res["prediction"] == int(t_res["prediction"])
    scale = max(np.abs(t_W).max(), 1e-9)
    np.testing.assert_allclose(j_W, t_W, rtol=1e-4, atol=1e-5 * scale)

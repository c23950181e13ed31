"""End-to-end b=2 differential for the FROM-SCRATCH B-cos model zoo (L2).

The bcosified-conversion families have their own oracles
(test_e2e_b2_oracle / _clip_ / _vit_); this one locks the from-scratch
`BcosResNet` against the reference's `bcos/models/resnet.py` (BcosConv2d
with unit-norm weights, uncentered/position norms, Identity activations,
internal LogitLayer, fc-before-GAP) — logits and explain-mode W(x), for
both the production norm choices (NoBias(BatchNormUncentered2d) and the
reference default NoBias(DetachablePositionNorm2d)).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reference_loader import (  # noqa: E402
    load_reference_from_scratch_models,
    reference_available,
)

from bcosification_tpu.explain import core as E  # noqa: E402
from bcosification_tpu.models import resnet as resnet_lib  # noqa: E402
from bcosification_tpu.modules import BcosConv2d, Identity  # noqa: E402
from bcosification_tpu.modules import norms as my_norms  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

INPLANES, NC, INPUT = 16, 7, 64
LAYERS = (1, 1, 1, 1)


def _build_ref(variant):
    norm_kind = "posnorm" if variant == "posnorm" else "bnu"
    mod = load_reference_from_scratch_models()
    import sys

    ref_norms = sys.modules["bcos.modules.norms"]
    norm = (
        ref_norms.NoBias(ref_norms.BatchNormUncentered2d)
        if norm_kind == "bnu"
        else ref_norms.NoBias(ref_norms.DetachablePositionNorm2d)
    )
    torch.manual_seed(0)
    if variant == "resnext":
        # grouped Bottleneck (the resnext entrypoints, resnet.py:382): the
        # grouped-conv patch-norm branch composed with gap_reorder
        block, extra = mod.Bottleneck, dict(groups=2, width_per_group=8)
    else:
        block, extra = mod.BasicBlock, {}
    ref = mod.BcosResNet(
        block,
        list(LAYERS),
        in_chans=6,
        num_classes=NC,
        inplanes=INPLANES,
        norm_layer=norm,
        # conv/act defaults: BcosConv2d (b=2, unit-norm weights), Identity
        **extra,
    )
    # carry real scale through the stack: random gammas + running vars (BNU)
    rng = np.random.default_rng(5)
    with torch.no_grad():
        for m in ref.modules():
            w = getattr(m, "weight", None)
            if w is not None and w.ndim == 1:  # norm affine weights
                gain = 4.0 if norm_kind == "bnu" else 1.0
                m.weight.copy_(
                    torch.from_numpy(
                        ((rng.random(w.shape[0]) + 0.5) * gain).astype(np.float32)
                    )
                )
            rv = getattr(m, "running_var", None)
            if rv is not None:
                rv.copy_(
                    torch.from_numpy((rng.random(rv.shape[0]) + 0.5).astype(np.float32))
                )
    return ref.eval()


def _fill_from_ref(variables, ref):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def tpath(scope):
        out = []
        for s in scope:
            if s.startswith("layer") and "_" in s:
                stage, j = s.split("_")
                out += [stage, j]
            elif s == "downsample_conv":
                out += ["downsample", "0"]
            elif s == "downsample_norm":
                out += ["downsample", "1"]
            else:
                out.append(s)
        return out

    def fill(path, abstract):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        coll, scope, name = keys[0], keys[1:-1], keys[-1]
        tp = ".".join(tpath(scope))
        if coll == "batch_stats":
            if name == "num_batches_tracked":
                return jnp.zeros(abstract.shape, abstract.dtype)
            return jnp.asarray(sd[f"{tp}.{name}"])
        if name == "weight" and abstract.ndim == 4:  # conv HWIO <- OIHW
            return jnp.asarray(
                np.transpose(sd[f"{tp}.linear.weight"], (2, 3, 1, 0))
            )
        return jnp.asarray(sd[f"{tp}.{name}"])  # norm affine weight

    return jax.tree_util.tree_map_with_path(fill, variables)


def _build_mine(ref, variant):
    norm = (
        my_norms.NoBias(my_norms.DetachablePositionNorm2d)
        if variant == "posnorm"
        else my_norms.NoBias(my_norms.BatchNormUncentered2d)
    )
    if variant == "resnext":
        block, extra = "bottleneck", dict(groups=2, width_per_group=8)
    else:
        block, extra = "basic", {}
    net = resnet_lib.BcosResNet(
        block=block,
        layers=LAYERS,
        num_classes=NC,
        inplanes=INPLANES,
        norm_layer=norm,
        conv_layer=BcosConv2d,
        act_layer=Identity,
        stem_pool="avg",
        gap_reorder=True,
        with_logit_layer=True,
        **extra,
    )
    x0 = jnp.zeros((1, INPUT, INPUT, 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    variables = _fill_from_ref(abstract, ref)
    return net, variables


@pytest.fixture(scope="module", params=["bnu", "posnorm", "resnext"])
def zoo(request):
    ref = _build_ref(request.param)
    net, variables = _build_mine(ref, request.param)
    rng = np.random.default_rng(2)
    x = rng.random((2, 6, INPUT, INPUT)).astype(np.float32)
    x[:, 3:] = 1.0 - x[:, :3]  # AddInverse-consistent encoding
    # non-degeneracy guard (random b=2 nets contract, CLAUDE.md): the
    # differential is only meaningful with real pre-bias signal
    with torch.no_grad():
        pre = ref(torch.from_numpy(x)) + float(np.log(NC - 1))
    assert float(pre.abs().max()) > 1e-3
    return ref, net, variables, x


def test_zoo_b2_logits(zoo):
    ref, net, variables, x = zoo
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = max(np.abs(want + np.log(NC - 1)).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * max(scale, 1.0))


def test_zoo_b2_explain_W(zoo):
    ref, net, variables, x = zoo
    idx = 2
    xt = torch.from_numpy(x[:1]).clone().requires_grad_(True)
    t_res = ref.explain(xt, idx=idx)
    t_W = t_res["dynamic_linear_weights"].detach().numpy()[0].transpose(1, 2, 0)

    j_res = E.explain(net, variables, jnp.asarray(x[:1].transpose(0, 2, 3, 1)), idx=idx)
    j_W = np.asarray(j_res["dynamic_linear_weights"][0])
    assert j_res["prediction"] == int(t_res["prediction"])
    scale = max(np.abs(t_W).max(), 1e-9)
    np.testing.assert_allclose(j_W, t_W, rtol=1e-4, atol=1e-5 * scale)

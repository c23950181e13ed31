"""End-to-end b=2 differential for the from-scratch B-cos ConvNeXt (L2).

Locks `models/convnext.py` against the reference's `bcos/models/convnext.py`
(CNBlock = depthwise-7x7 BcosConv2d + norm + 1x1 expand/project + layer
scale + residual, patchify stem, norm+conv downsampling, classifier-before-
GAP, LogitLayer) — logits and explain-mode W(x), for both the reference
default NoBias(DetachablePositionNorm2d) and the convnext_*_bnu
NoBias(BatchNormUncentered2d) norm choices (ref pretrained.py:616-706).
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
from bcosification_tpu.models import convnext as convnext_lib  # noqa: E402
from bcosification_tpu.modules import norms as my_norms  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

NC, INPUT = 7, 32
SETTING = [(8, 16, 1), (16, None, 2)]
LAYER_SCALE = 0.5
SD_PROB = 0.1  # identity in eval mode on both sides


def _ref_norm(norm_kind, ref_norms):
    return (
        ref_norms.NoBias(ref_norms.BatchNormUncentered2d)
        if norm_kind == "bnu"
        else ref_norms.NoBias(ref_norms.DetachablePositionNorm2d)
    )


def _build_ref(norm_kind):
    load_reference_from_scratch_models()
    mod = load_reference("bcos.models.convnext")
    import sys

    ref_norms = sys.modules["bcos.modules.norms"]
    torch.manual_seed(0)
    ref = mod.BcosConvNeXt(
        [mod.CNBlockConfig(*s) for s in SETTING],
        stochastic_depth_prob=SD_PROB,
        layer_scale=LAYER_SCALE,
        num_classes=NC,
        norm_layer=_ref_norm(norm_kind, ref_norms),
    )
    # carry real scale through the stack: random norm gammas, running vars,
    # and layer scales (random b=2 nets contract otherwise, CLAUDE.md)
    rng = np.random.default_rng(5)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.ndim == 1 or name.endswith("layer_scale"):
                gain = 3.0 if norm_kind == "bnu" else 1.0
                p.copy_(
                    torch.from_numpy(
                        ((rng.random(p.shape[0] if p.ndim == 1 else p.shape[0])
                          + 0.5) * gain).astype(np.float32)
                    ).reshape(p.shape)
                )
        for m in ref.modules():
            rv = getattr(m, "running_var", None)
            if rv is not None:
                rv.copy_(
                    torch.from_numpy(
                        (rng.random(rv.shape[0]) + 0.5).astype(np.float32)
                    )
                )
    return ref.eval()


def _feature_idx(si):
    """torch features Sequential index of stage si (stem conv+norm occupy
    0/1; each earlier stage with downsampling contributes stage+down)."""
    idx = 2
    for j in range(si):
        idx += 2 if SETTING[j][1] is not None else 1
    return idx


def _fill_from_ref(abstract, ref):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def tpath(scope):
        out = []
        for s in scope:
            if s == "stem_conv":
                out.append("features.0")
            elif s == "stem_norm":
                out.append("features.1")
            elif s.startswith("stage"):
                si, bi = s[len("stage"):].split("_block")
                out.append(f"features.{_feature_idx(int(si))}.{bi}")
            elif s.startswith("down") and s.endswith("_norm"):
                out.append(f"features.{_feature_idx(int(s[4:-5])) + 1}.0")
            elif s.startswith("down") and s.endswith("_conv"):
                out.append(f"features.{_feature_idx(int(s[4:-5])) + 1}.1")
            elif s.startswith("block_"):
                out.append(f"block.{s[len('block_'):]}")
            elif s == "classifier_norm":
                out.append("classifier.0")
            elif s == "classifier_conv":
                out.append("classifier.1")
            else:
                out.append(s)
        return ".".join(out)

    def fill(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        coll, scope, name = keys[0], keys[1:-1], keys[-1]
        tp = tpath(scope)
        if coll == "batch_stats":
            if name == "num_batches_tracked":
                return jnp.zeros(leaf.shape, leaf.dtype)
            return jnp.asarray(sd[f"{tp}.{name}"])
        if name == "layer_scale":
            return jnp.asarray(sd[f"{tp}.layer_scale"].reshape(-1))
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
    net = convnext_lib.BcosConvNeXt(
        block_setting=tuple(convnext_lib.CNBlockConfig(*s) for s in SETTING),
        stochastic_depth_prob=SD_PROB,
        layer_scale=LAYER_SCALE,
        num_classes=NC,
        norm_layer=norm,
    )
    x0 = jnp.zeros((1, INPUT, INPUT, 6), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    return net, _fill_from_ref(abstract, ref)


@pytest.fixture(scope="module", params=["posnorm", "bnu"])
def cnx(request):
    ref = _build_ref(request.param)
    net, variables = _build_mine(ref, request.param)
    rng = np.random.default_rng(2)
    x = rng.random((2, 6, INPUT, INPUT)).astype(np.float32)
    x[:, 3:] = 1.0 - x[:, :3]  # AddInverse-consistent encoding
    with torch.no_grad():
        pre = ref(torch.from_numpy(x)) + float(np.log(NC - 1))
    assert float(pre.abs().max()) > 1e-3  # non-degeneracy guard
    return ref, net, variables, x


def test_convnext_b2_logits(cnx):
    ref, net, variables, x = cnx
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = max(np.abs(want + np.log(NC - 1)).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * max(scale, 1.0))


def test_convnext_b2_explain_W(cnx):
    ref, net, variables, x = cnx
    idx = 3
    xt = torch.from_numpy(x[:1]).clone().requires_grad_(True)
    t_res = ref.explain(xt, idx=idx)
    t_W = t_res["dynamic_linear_weights"].detach().numpy()[0].transpose(1, 2, 0)

    j_res = E.explain(net, variables, jnp.asarray(x[:1].transpose(0, 2, 3, 1)), idx=idx)
    j_W = np.asarray(j_res["dynamic_linear_weights"][0])
    assert j_res["prediction"] == int(t_res["prediction"])
    scale = max(np.abs(t_W).max(), 1e-9)
    np.testing.assert_allclose(j_W, t_W, rtol=1e-4, atol=1e-5 * scale)

"""Standard (non-B-cos) SimpleViT differential vs the reference.

The standard_* registry entrypoints (ref pretrained.py:1185-1448) build
SimpleViT with plain nn.Linear / nn.LayerNorm / nn.GELU and 3-channel input
(vit_final/experiment_parameters.py:101-116 + model.py:36-39). This locks
that composition — patchify order, sincos pos-emb, plain-qkv attention,
GELU MLPs, mean-then-head — against the reference's own `bcos/models/vit.py`
at fp32.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("einops")

from reference_loader import (  # noqa: E402
    load_reference,
    load_reference_from_scratch_models,
    reference_available,
)

from bcosification_tpu.models import vit as vit_lib  # noqa: E402
from bcosification_tpu.modules import DetachableGELU  # noqa: E402
from bcosification_tpu.modules import norms as my_norms  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

ARCH = dict(
    image_size=32, patch_size=8, num_classes=7, dim=32, depth=2, heads=4,
    mlp_dim=64,
)


def _build_ref():
    load_reference_from_scratch_models()
    mod = load_reference("bcos.models.vit")
    torch.manual_seed(0)
    ref = mod.SimpleViT(
        channels=3,
        linear_layer=torch.nn.Linear,
        norm_layer=torch.nn.LayerNorm,
        act_layer=torch.nn.GELU,
        conv2d_layer=torch.nn.Conv2d,
        **ARCH,
    )
    # non-trivial norm affines so the differential exercises them
    rng = np.random.default_rng(5)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "norm" in name and p.ndim == 1:
                p.copy_(
                    torch.from_numpy(
                        ((rng.random(p.shape[0]) - 0.5) * 2.0).astype(np.float32)
                    )
                )
    return ref.eval()


def _fill_from_ref(abstract, ref):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def tpath(scope):
        out = []
        for s in scope:
            if s == "to_patch_embedding_linear":
                out.append("to_patch_embedding.linear")
            elif s.startswith("encoder_"):
                out.append(f"transformer.{s}")
            elif s == "ff":
                out.append("ff.net")
            elif s == "linear_head_norm":
                out.append("linear_head.norm")
            elif s == "linear_head_linear":
                out.append("linear_head.linear")
            else:
                out.append(s)
        return ".".join(out)

    def fill(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        scope, name = keys[1:-1], keys[-1]
        t = sd[f"{tpath(scope)}.{name}"]
        if name == "weight" and leaf.ndim == 2:  # Linear (in,out) <- (out,in)
            return jnp.asarray(t.T)
        return jnp.asarray(t)

    return jax.tree_util.tree_map_with_path(fill, abstract)


def test_standard_vitc_logits_match_reference():
    """Conv-stem (ViT-C) composition: plain Conv2d stem with
    GNLayerNorm2d + GELU triples (ref vit.py:342-366, stride 2 when the
    channel count grows), then the same transformer."""
    load_reference_from_scratch_models()
    mod = load_reference("bcos.models.vit")
    import sys

    ref_norms = sys.modules["bcos.modules.norms"]
    arch = dict(
        image_size=14, patch_size=1, num_classes=7, dim=32, depth=2, heads=4,
        mlp_dim=64,
    )
    torch.manual_seed(0)
    ref = mod.SimpleViT(
        channels=3,
        conv_stem=[8, 16],
        linear_layer=torch.nn.Linear,
        norm_layer=torch.nn.LayerNorm,
        act_layer=torch.nn.GELU,
        conv2d_layer=torch.nn.Conv2d,
        norm2d_layer=ref_norms.DetachableGNLayerNorm2d,
        **arch,
    ).eval()

    from bcosification_tpu.experiments.ImageNet.vit_final.model import _plain_conv

    net = vit_lib.SimpleViT(
        conv_stem=(8, 16),
        linear_layer=vit_lib.PlainLinear,
        norm_layer=my_norms.DetachableLayerNorm,
        act_layer=DetachableGELU,
        conv2d_layer=_plain_conv,
        norm2d_layer=my_norms.DetachableGNLayerNorm2d,
        **arch,
    )
    x0 = jnp.zeros((1, 14, 14, 3), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def fill(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        scope, name = keys[1:-1], keys[-1]
        out = []
        for s in scope:
            if s.startswith("conv_stem_"):
                out.append(f"to_patch_embedding.conv_stem.{s[len('conv_stem_'):]}")
            elif s == "to_patch_embedding_linear":
                out.append("to_patch_embedding.linear")
            elif s.startswith("encoder_"):
                out.append(f"transformer.{s}")
            elif s == "ff":
                out.append("ff.net")
            elif s == "linear_head_norm":
                out.append("linear_head.norm")
            elif s == "linear_head_linear":
                out.append("linear_head.linear")
            else:
                out.append(s)
        t = sd[f"{'.'.join(out)}.{name}"]
        if name == "weight" and leaf.ndim == 4:  # conv HWIO <- OIHW
            return jnp.asarray(np.transpose(t, (2, 3, 1, 0)))
        if name == "weight" and leaf.ndim == 2:
            return jnp.asarray(t.T)
        return jnp.asarray(t)

    variables = jax.tree_util.tree_map_with_path(fill, abstract)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 14, 14)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.abs(want).max() > 1e-2  # non-degeneracy
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_standard_vit_logits_match_reference():
    ref = _build_ref()
    net = vit_lib.SimpleViT(
        linear_layer=vit_lib.PlainLinear,
        norm_layer=my_norms.DetachableLayerNorm,
        act_layer=DetachableGELU,
        **ARCH,
    )
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    abstract = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    variables = _fill_from_ref(abstract, ref)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.abs(want).max() > 1e-2  # non-degeneracy
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

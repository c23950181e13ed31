"""Explanation-core tests: completeness, linearity, gradient_to_image parity
with the torch reference implementation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.explain import core as E
from bcosification_tpu.modules import BcosConv2d, BcosSequential, LogitLayer

from reference_loader import load_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


class TinyBcosNet(nn.Module):
    """Bias-free all-B-cos toy classifier: completeness must hold exactly."""

    num_classes: int = 5

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        x = BcosConv2d(features=8, kernel_size=3, padding=1, b=2.0)(
            x, train=train, explain=explain
        )
        x = BcosConv2d(features=16, kernel_size=3, stride=2, padding=1, b=2.0)(
            x, train=train, explain=explain
        )
        x = BcosConv2d(features=self.num_classes, kernel_size=1, b=2.0)(
            x, train=train, explain=explain
        )
        return x.mean(axis=(1, 2))  # GAP after classifier (GAP-reorder style)


@pytest.fixture
def tiny_model(rng):
    model = TinyBcosNet()
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 6), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_completeness(tiny_model):
    """(x * W(x)).sum() == explained logit for bias-free B-cos nets."""
    model, variables, x = tiny_model
    res = E.explain(model, variables, x)
    logit = float(res["logits"][0, res["explained_class_idx"]])
    total = float(res["contribution_map"].sum())
    np.testing.assert_allclose(total, logit, rtol=1e-4)


def test_explained_value_matches_normal_forward(tiny_model):
    """explain=True must not change forward *values*, only gradients."""
    model, variables, x = tiny_model
    out_n = model.apply(variables, x)
    out_e = model.apply(variables, x, explain=True)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_e), rtol=1e-5)


def test_attribute_selection_shapes(tiny_model):
    model, variables, x = tiny_model

    def apply_fn(xx):
        return model.apply(variables, xx, explain=True)

    atts = E.attribute_selection(apply_fn, x, [0, 1, 2])
    assert atts.shape == (3, 16, 16, 6)
    # each attribution must sum to its class logit (completeness per class)
    logits = np.asarray(apply_fn(x))[0]
    for t in range(3):
        np.testing.assert_allclose(
            float(atts[t].sum()), logits[t], rtol=1e-4, atol=1e-6
        )


@needs_reference
def test_gradient_to_image_vs_torch(rng):
    import torch

    ref = load_reference("bcos.common")
    img = rng.random((6, 24, 24)).astype(np.float32)
    # make the encoding consistent: channels 3:6 = 1 - channels 0:3
    img[3:] = 1.0 - img[:3]
    linmap = rng.standard_normal((6, 24, 24)).astype(np.float32)

    t_img = ref.gradient_to_image(torch.from_numpy(img), torch.from_numpy(linmap))
    j_img = np.asarray(
        E.gradient_to_image(
            jnp.asarray(img.transpose(1, 2, 0)), jnp.asarray(linmap.transpose(1, 2, 0))
        )
    )
    np.testing.assert_allclose(j_img, t_img, rtol=1e-3, atol=1e-4)


def test_explain_full_pipeline(tiny_model):
    model, variables, x = tiny_model
    res = E.explain(model, variables, x, idx=2)
    assert res["explained_class_idx"] == 2
    assert res["explanation"].shape == (16, 16, 4)
    assert res["dynamic_linear_weights"].shape == x.shape
    assert 0.0 <= float(res["explanation"][..., 3].min())
    assert float(res["explanation"][..., 3].max()) <= 1.0

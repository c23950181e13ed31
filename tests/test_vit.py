"""ViT tests: parity vs the reference lucidrains SimpleViT (standard layers)
and exactness of the bcosification patchify channel-doubling transform."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.bcosify import params as P
from bcosification_tpu.bcosify.torch_import import simple_vit_torch_to_variables
from bcosification_tpu.models import vit as vit_lib
from bcosification_tpu.modules import norms

from reference_loader import load_reference, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _std_vit_torch(dim=32, depth=2, heads=2, mlp_dim=64, image_size=16, patch_size=8, num_classes=5):
    import torch.nn as tnn

    ref_vit = load_reference("bcos.models.vit")
    return ref_vit.SimpleViT(
        image_size=image_size,
        patch_size=patch_size,
        num_classes=num_classes,
        dim=dim,
        depth=depth,
        heads=heads,
        mlp_dim=mlp_dim,
        channels=3,
        linear_layer=tnn.Linear,
        norm_layer=tnn.LayerNorm,
        act_layer=tnn.GELU,
    )


def _import_std_vit(tmodel, depth, image_size, channels):
    """Import a *standard* torch SimpleViT into my SimpleViT with plain
    layers (no bcosify transforms)."""
    model = vit_lib.SimpleViT(
        image_size=image_size,
        patch_size=8,
        num_classes=5,
        dim=32,
        depth=depth,
        heads=2,
        mlp_dim=64,
        linear_layer=vit_lib.PlainLinear,
        norm_layer=norms.DetachableLayerNorm,
        act_layer=__import__(
            "bcosification_tpu.modules", fromlist=["DetachableGELU"]
        ).DetachableGELU,
    )
    x0 = jnp.zeros((1, image_size, image_size, channels), jnp.float32)
    abstract = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = simple_vit_torch_to_variables(
        abstract, sd, depth, add_channels=False, use_bias=True, backbone_scope=()
    )
    return model, variables


@needs_reference
def test_standard_vit_parity(rng):
    import torch

    tmodel = _std_vit_torch()
    tmodel.eval()
    model, variables = _import_std_vit(tmodel, depth=2, image_size=16, channels=3)

    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_patchify_channel_doubling_exact(rng):
    """Doubled patch-linear on AddInverse-normalised input == original linear
    on normalised 3ch input (bcosify_vit.py:94-121 exactness)."""
    p = 4
    w3 = rng.standard_normal((3 * p * p, 8)).astype(np.float32)  # (in, out)
    w6 = P.vit_patchify_linear_add_channels(w3, 3 * p * p)

    z = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)  # normalised img
    z6 = np.concatenate([z, -z], axis=-1)  # AddInverse after normalisation

    from bcosification_tpu.models.vit import _patchify

    p3 = np.asarray(_patchify(jnp.asarray(z), p, p))  # [1,h,w,p*p*3]
    p6 = np.asarray(_patchify(jnp.asarray(z6), p, p))
    np.testing.assert_allclose(p6 @ w6, p3 @ w3, rtol=1e-5, atol=1e-5)


@needs_reference
def test_patchify_doubling_matches_reference_reshape(rng):
    """The transform equals the reference's view/cat/view weight surgery
    (bcosify_vit.py:98-117)."""
    import torch

    out_f, in_f = 8, 48
    W = torch.from_numpy(rng.standard_normal((out_f, in_f)).astype(np.float32))
    W_r = W.view(out_f, -1, 3)
    W_new = torch.cat([W_r / 2, -W_r / 2], dim=2).view(out_f, in_f * 2)

    mine = P.vit_patchify_linear_add_channels(
        np.ascontiguousarray(W.numpy().T), in_f
    )  # (in*2, out)
    np.testing.assert_allclose(mine, W_new.numpy().T, rtol=1e-6)


def test_pos_emb_sincos_matches_reference_formula():
    pe = np.asarray(vit_lib.pos_emb_sincos_2d(3, 3, 8))
    assert pe.shape == (9, 8)
    # dim/4=2 frequencies; first quarter is sin(x * omega)
    omega = 1.0 / (10000 ** (np.arange(2) / 1.0))
    y, x = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    np.testing.assert_allclose(
        pe[:, :2], np.sin(x.flatten()[:, None] * omega), rtol=1e-5, atol=1e-6
    )

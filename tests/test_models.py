"""Model zoo shape/selfconsistency tests (small inputs for CPU speed)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.models import convnext, densenet, resnet, vgg, vit


def _run(model, x, **kw):
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, **kw)
    out_e = model.apply(variables, x, explain=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_e), rtol=2e-3, atol=1e-5)
    return variables, out


def test_from_scratch_resnet(rng):
    model = resnet.BcosResNet(
        block="basic", layers=(1, 1), inplanes=8, num_classes=7, small_inputs=True
    )
    x = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))
    variables, out = _run(model, x)
    assert out.shape == (2, 7)


def test_resnext_grouped(rng):
    model = resnet.BcosResNet(
        block="bottleneck", layers=(1,), inplanes=8, num_classes=5,
        groups=4, width_per_group=32, small_inputs=True,
    )
    x = jnp.asarray(rng.random((2, 16, 16, 6)).astype(np.float32))
    _, out = _run(model, x)
    assert out.shape == (2, 5)


def test_densenet(rng):
    model = densenet.BcosDenseNet(
        growth_rate=4, block_config=(2, 2), num_init_features=8, num_classes=5,
        small_inputs=True, with_logit_layer=True,
    )
    x = jnp.asarray(rng.random((2, 16, 16, 6)).astype(np.float32))
    _, out = _run(model, x)
    assert out.shape == (2, 5)


def test_vgg(rng):
    model = vgg.BcosVGG(cfg="A", num_classes=5)
    x = jnp.asarray(rng.random((1, 64, 64, 6)).astype(np.float32))
    _, out = _run(model, x)
    assert out.shape == (1, 5)


def test_convnext(rng):
    model = convnext.BcosConvNeXt(
        block_setting=(
            convnext.CNBlockConfig(8, 16, 1),
            convnext.CNBlockConfig(16, None, 1),
        ),
        num_classes=5,
    )
    x = jnp.asarray(rng.random((1, 32, 32, 6)).astype(np.float32))
    _, out = _run(model, x)
    assert out.shape == (1, 5)


def test_simple_vit(rng):
    model = vit.SimpleViT(
        image_size=32, patch_size=8, num_classes=5, dim=32, depth=2, heads=2,
        mlp_dim=64, with_logit_layer=True,
    )
    x = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))
    _, out = _run(model, x)
    assert out.shape == (2, 5)


def test_vit_gap_reorder_variants(rng):
    kw = dict(image_size=32, patch_size=8, num_classes=5, dim=32, depth=1, heads=2, mlp_dim=64)
    x = jnp.asarray(rng.random((1, 32, 32, 6)).astype(np.float32))
    for gr in (False, True):
        model = vit.SimpleViT(gap_reorder=gr, **kw)
        _, out = _run(model, x)
        assert out.shape == (1, 5)


def test_vitc_conv_stem(rng):
    from functools import partial

    from bcosification_tpu.modules import BcosConv2d, norms

    model = vit.SimpleViT(
        image_size=16, patch_size=1, num_classes=5, dim=16, depth=1, heads=2,
        mlp_dim=32, conv_stem=(8, 16),
        conv2d_layer=BcosConv2d,
        norm2d_layer=norms.NoBias(norms.DetachableGNLayerNorm2d),
    )
    # conv stem: first layer stride 2 (8 > 6 channels), second stride 2 -> /4
    x = jnp.asarray(rng.random((1, 64, 64, 6)).astype(np.float32))
    _, out = _run(model, x)
    assert out.shape == (1, 5)


def test_pretrained_registry():
    from bcosification_tpu.models import pretrained

    names = pretrained.list_available()
    assert "resnet50" in names and "simple_vit_b_patch16_224" in names
    assert "densenet121" in names and "convnext_tiny" in names and "vgg11_bnu" in names
    # reference convnext.py registers atto/tiny/small/base/large (ref :243-343)
    assert {
        "convnext_atto",
        "convnext_tiny",
        "convnext_small",
        "convnext_base",
        "convnext_large",
    } <= set(names)
    # every @register entrypoint of the reference (pretrained.py:120-1448)
    # exists here: CNNs, bnu/long variants, B-cos + standard ViT/ViT-C
    ref_entrypoints = {
        "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
        "resnext50_32x4d", "densenet121", "densenet161", "densenet169",
        "densenet201", "vgg11_bnu", "convnext_tiny", "convnext_base",
        "convnext_tiny_bnu", "convnext_base_bnu", "resnet50_long",
        "resnet152_long", "densenet121_long",
        "simple_vit_ti_patch16_224", "simple_vit_s_patch16_224",
        "simple_vit_b_patch16_224", "simple_vit_l_patch16_224",
        "vitc_ti_patch1_14", "vitc_s_patch1_14", "vitc_b_patch1_14",
        "vitc_l_patch1_14",
        "standard_simple_vit_ti_patch16_224",
        "standard_simple_vit_s_patch16_224",
        "standard_simple_vit_b_patch16_224",
        "standard_simple_vit_l_patch16_224",
        "standard_vitc_ti_patch1_14", "standard_vitc_s_patch1_14",
        "standard_vitc_b_patch1_14", "standard_vitc_l_patch1_14",
    }
    assert ref_entrypoints <= set(names), sorted(ref_entrypoints - set(names))


def test_pretrained_url_vit_and_long_mapping():
    """Entrypoint->release-URL mapping matches the reference: bare ViT names
    are B-cos models (bcos_-prefixed keys, ref pretrained.py:858-1180),
    standard_* map to unprefixed keys (:1185-1448), _long/_pn variants come
    from the bcos_final_long group (:616-845)."""
    from bcosification_tpu.models.pretrained import pretrained_url, pretrained_urls

    urls = pretrained_urls()
    assert pretrained_url("simple_vit_b_patch16_224") == \
        urls["vit_final"]["bcos_simple_vit_b_patch16_224"]
    assert pretrained_url("standard_simple_vit_b_patch16_224") == \
        urls["vit_final"]["simple_vit_b_patch16_224"]
    assert pretrained_url("vitc_l_patch1_14") == \
        urls["vit_final"]["bcos_vitc_l_patch1_14"]
    assert pretrained_url("resnet50_long") == urls["bcos_final_long"]["resnet_50"]
    assert pretrained_url("densenet121_long") == \
        urls["bcos_final_long"]["densenet_121"]
    assert pretrained_url("convnext_tiny") == \
        urls["bcos_final_long"]["convnext_tiny_pn"]
    assert pretrained_url("convnext_tiny_bnu") == \
        urls["bcos_final_long"]["convnext_tiny_bnu"]
    # non-vit lookups untouched
    assert pretrained_url("resnet18") == urls["bcos_final"]["resnet_18"]
    # the 'x4d' suffix must survive name normalisation (aliased explicitly:
    # the generic ([a-z])(\d) split would yield resnext_50_32x_4d)
    assert pretrained_url("resnext50_32x4d") == \
        urls["bcos_final"]["resnext_50_32x4d"]


def test_standard_vit_entrypoint_builds():
    """standard_* entrypoints build plain (non-B-cos) ViTs: 3-channel input,
    1000-way head, no logit layer (ref pretrained.py:1185-1223)."""
    import jax

    from bcosification_tpu.models import pretrained

    model, variables = pretrained.load_model(
        "standard_vitc_ti_patch1_14", pretrained=False
    )
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.ones((2, 14, 14, 3))
    )
    assert out.shape == (2, 1000)
    assert "logit_layer" not in str(jax.tree_util.tree_structure(variables))


def test_standard_vit_uses_plain_norm_and_gelu():
    """standard_* baselines use PLAIN LayerNorm/GELU per the reference
    standard config (vit_final/experiment_parameters.py:113-115 —
    nn.LayerNorm/nn.GELU carry no explanation-mode detach; only the shared
    Attention q/k detach and the conv-stem GN remain detachable). Verified
    at the layer level: explain=True must not change LN/GELU input
    gradients (advisor round-3 finding)."""
    import jax

    from bcosification_tpu.models import pretrained
    from bcosification_tpu.modules import PlainGELU, norms

    model, _ = pretrained.load_model(
        "standard_simple_vit_ti_patch16_224", pretrained=False
    )
    # the entrypoint wires plain variants into the architecture
    ln = model.norm_layer(8)
    assert not ln.detachable
    act = model.act_layer()
    assert not act.detachable

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8))
    v = ln.init(jax.random.PRNGKey(1), x)

    def g(layer, variables, explain):
        return jax.grad(
            lambda xx: layer.apply(variables, xx, explain=explain).sum()
        )(x)

    assert jnp.array_equal(g(ln, v, False), g(ln, v, True))
    # ... whereas the detachable default differs (sanity of the test itself)
    dln = norms.DetachableLayerNorm(8)
    assert not jnp.array_equal(g(dln, v, False), g(dln, v, True))

    gelu = PlainGELU()
    gv = gelu.init(jax.random.PRNGKey(2), x)
    assert jnp.array_equal(g(gelu, gv, False), g(gelu, gv, True))


def test_convnext_bnu_entrypoint_builds():
    """convnext_*_bnu swap position norm for uncentered BN (running stats
    present; ref pretrained.py:616-706)."""
    import jax

    from bcosification_tpu.models import pretrained

    model, variables = pretrained.load_model("convnext_tiny_bnu", pretrained=False)
    assert "batch_stats" in variables
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.ones((1, 64, 64, 6))
    )
    assert out.shape == (1, 1000)


def test_convnext_small_large_settings():
    """convnext_small/large match the reference block settings + sd prob
    (ref bcos/models/convnext.py:283-343) without instantiating full nets."""
    small = convnext.convnext_small(num_classes=10)
    assert [
        (c.input_channels, c.out_channels, c.num_layers) for c in small.block_setting
    ] == [(96, 192, 3), (192, 384, 3), (384, 768, 27), (768, None, 3)]
    assert small.stochastic_depth_prob == 0.4
    large = convnext.convnext_large(num_classes=10)
    assert [
        (c.input_channels, c.out_channels, c.num_layers) for c in large.block_setting
    ] == [(192, 384, 3), (384, 768, 3), (768, 1536, 27), (1536, None, 3)]
    assert large.stochastic_depth_prob == 0.5


def test_zeroshot_eval_datamodules(tmp_path):
    """CIFAR100/FashionMNIST/STL10 native readers (ZeroshotEval suite,
    reference trainer.py:164-355) round-trip synthetic files."""
    import gzip
    import pickle

    import numpy as np

    from bcosification_tpu.data.datamodules import ClassificationDataModule

    registry = ClassificationDataModule.registry()
    assert {"CIFAR100", "FashionMNIST", "STL10"} <= set(registry)
    rng = np.random.default_rng(0)

    # CIFAR-100
    c100 = tmp_path / "cifar-100-python"
    c100.mkdir()
    for split, n in (("train", 8), ("test", 4)):
        data = rng.integers(0, 255, (n, 3 * 32 * 32), dtype=np.uint8)
        with open(c100 / split, "wb") as f:
            pickle.dump(
                {b"data": data, b"fine_labels": list(range(n))}, f
            )

    # FashionMNIST idx gz
    fm = tmp_path / "FashionMNIST" / "raw"
    fm.mkdir(parents=True)
    for prefix, n in (("train", 6), ("t10k", 3)):
        imgs = rng.integers(0, 255, (n, 28, 28), dtype=np.uint8)
        header = (2051).to_bytes(4, "big") + n.to_bytes(4, "big") + (28).to_bytes(4, "big") * 2
        with gzip.open(fm / f"{prefix}-images-idx3-ubyte.gz", "wb") as f:
            f.write(header + imgs.tobytes())
        lbl_header = (2049).to_bytes(4, "big") + n.to_bytes(4, "big")
        with gzip.open(fm / f"{prefix}-labels-idx1-ubyte.gz", "wb") as f:
            f.write(lbl_header + bytes(range(n)))

    # STL-10 binary
    stl = tmp_path / "stl10_binary"
    stl.mkdir()
    for split, n in (("train", 5), ("test", 2)):
        rng.integers(0, 255, (n, 3, 96, 96), dtype=np.uint8).tofile(
            stl / f"{split}_X.bin"
        )
        (np.arange(n, dtype=np.uint8) % 10 + 1).tofile(stl / f"{split}_y.bin")

    ident = lambda im: np.asarray(im, np.float32) / 255.0
    for name, n_eval, hw in (("CIFAR100", 4, 32), ("FashionMNIST", 3, 28), ("STL10", 2, 96)):
        dm = registry[name](
            dict(batch_size=2, data_root=str(tmp_path),
                 train_transform=ident, test_transform=ident)
        )
        dm.setup("test")
        assert len(dm.eval_dataset) == n_eval
        img, tgt = dm.eval_dataset[0]
        assert img.shape == (hw, hw, 3) and img.dtype == np.float32
        assert 0 <= int(tgt) < dm.NUM_CLASSES
        assert len(dm.CATEGORIES) == dm.NUM_CLASSES

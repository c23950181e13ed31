"""Conversion-engine tests.

Gold oracle (SURVEY.md §4b): add_channels + BnUncV2 bias-fold + fc->1x1-conv
are *exact-equivalence* transforms; with b=1 and biases kept, the bcosified
model at init must reproduce the pretrained torch model's logits on the same
images (eval mode) to float32 precision.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from bcosification_tpu.bcosify import params as P  # noqa: E402
from bcosification_tpu.bcosify.engine import build_bcosified_resnet  # noqa: E402


# --- a miniature torchvision-style ResNet (same state_dict key scheme) ------


class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchMiniResNet(tnn.Module):
    """resnet18-shaped with inplanes=8, layers=(2,2,2,2) truncated to (1,1),
    avgpool stem (the standard_changes swap), num_classes=7."""

    def __init__(self, inplanes=8, num_classes=7):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, inplanes, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(inplanes)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.AvgPool2d(3, 2, 1)  # standard change applied
        self.layer1 = tnn.Sequential(TorchBasicBlock(inplanes, inplanes))
        ds = tnn.Sequential(
            tnn.Conv2d(inplanes, inplanes * 2, 1, 2, bias=False),
            tnn.BatchNorm2d(inplanes * 2),
        )
        self.layer2 = tnn.Sequential(
            TorchBasicBlock(inplanes, inplanes * 2, stride=2, downsample=ds)
        )
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(inplanes * 2, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer2(self.layer1(x))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def _randomize_bn_stats(model, rng):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.from_numpy(rng.standard_normal(m.num_features).astype(np.float32))
                )
                m.running_var.copy_(
                    torch.from_numpy((rng.random(m.num_features) + 0.5).astype(np.float32))
                )
                m.weight.copy_(
                    torch.from_numpy((rng.random(m.num_features) + 0.5).astype(np.float32))
                )
                m.bias.copy_(
                    torch.from_numpy(rng.standard_normal(m.num_features).astype(np.float32))
                )


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@pytest.fixture
def mini_setup(rng):
    tmodel = TorchMiniResNet()
    _randomize_bn_stats(tmodel, rng)
    tmodel.eval()
    model_config = {
        "name": "resnet18",
        "bcosify_args": {
            "fix_b": True,
            "use_bias": True,  # keep biases -> exactness
            "norm_layer": "BnUncV2",
            "gap": True,
            "act_layer": True,
        },
        "bcos_args": {"b": 1},  # b=1 -> plain linear layers -> exactness
    }
    return tmodel, model_config


def _mini_build(model_config, tmodel):
    import bcosification_tpu.bcosify.engine as eng

    # patch the layer table for the miniature arch
    old = eng.RESNET_LAYERS["resnet18"]
    eng.RESNET_LAYERS["resnet18"] = ("basic", (1, 1))
    try:
        net, variables = build_bcosified_resnet(
            model_config,
            tmodel.state_dict(),
            input_size=32,
            num_classes=7,
            inplanes=8,
        )
    finally:
        eng.RESNET_LAYERS["resnet18"] = old
    return net, variables


def test_b1_conversion_is_exact(rng, mini_setup):
    """bcosified(AddInverse(x)) == pretrained(Normalize(x)) at init for b=1."""
    tmodel, model_config = mini_setup
    net, variables = _mini_build(model_config, tmodel)

    x = rng.random((2, 3, 32, 32)).astype(np.float32)  # raw [0,1] image, NCHW

    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    with torch.no_grad():
        t_logits = tmodel((torch.from_numpy(x) - mean) / std).numpy()

    # AddInverse encoding, NHWC
    x_nhwc = x.transpose(0, 2, 3, 1)
    x6 = np.concatenate([x_nhwc, 1.0 - x_nhwc], axis=-1)
    j_logits = np.asarray(net.apply(variables, jnp.asarray(x6)))

    # LogitLayer adds -log(num_classes-1): remove before comparing
    j_logits = j_logits + np.log(7 - 1)
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-4, atol=1e-5)


def test_b2_conversion_structure(rng, mini_setup):
    """b=2 (production recipe, biases removed): runs, bias params absent."""
    tmodel, model_config = mini_setup
    model_config["bcos_args"]["b"] = 2
    model_config["bcosify_args"]["use_bias"] = False
    net, variables = _mini_build(model_config, tmodel)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("bias" in n for n in names), names
    x6 = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))
    out = net.apply(variables, x6)
    assert out.shape == (2, 7)
    out_e = net.apply(variables, x6, explain=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_e), rtol=1e-5)


def test_add_channels_exactness(rng):
    """conv(w', [z,-z]) == conv(w, z) with w' = [w,-w]/2."""
    w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)
    z = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    from bcosification_tpu.ops.bcos import _conv

    w6 = P.add_channels_conv_weight(w)
    z6 = np.concatenate([z, -z], axis=-1)
    y3 = _conv(jnp.asarray(z), jnp.asarray(w), 1, 1, 1, 1)
    y6 = _conv(jnp.asarray(z6), jnp.asarray(w6), 1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(y6), np.asarray(y3), rtol=1e-5, atol=1e-6)


def test_bn_fold_exactness(rng):
    """uncentered BN with folded bias == centered BN (eval)."""
    c = 8
    x = rng.standard_normal((2, c, 5, 5)).astype(np.float32)
    gamma = (rng.random(c) + 0.5).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = (rng.random(c) + 0.5).astype(np.float32)

    tbn = tnn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(gamma))
        tbn.bias.copy_(torch.from_numpy(beta))
        tbn.running_mean.copy_(torch.from_numpy(mean))
        tbn.running_var.copy_(torch.from_numpy(var))
    tbn.eval()
    want = tbn(torch.from_numpy(x)).detach().numpy()

    from bcosification_tpu.modules import norms as N

    folded_bias = P.bn_uncentered_fold_bias(beta, mean, var, gamma)
    mod = N.BatchNormUncentered2d(features=c)
    variables = {
        "params": {"weight": jnp.asarray(gamma), "bias": jnp.asarray(folded_bias)},
        "batch_stats": {
            "running_var": jnp.asarray(var),
            "num_batches_tracked": jnp.zeros((), jnp.int32),
        },
    }
    got = np.asarray(mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-6)

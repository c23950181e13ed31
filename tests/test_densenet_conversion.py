"""DenseNet conversion oracle: b=1 + kept biases reproduces the pretrained
torch model exactly (same key scheme as torchvision densenet121)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TorchDenseLayer(tnn.Module):
    def __init__(self, in_ch, growth, bn_size=2):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(in_ch)
        self.relu1 = tnn.ReLU(inplace=True)
        self.conv1 = tnn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.relu2 = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        out = self.conv1(self.relu1(self.norm1(x)))
        out = self.conv2(self.relu2(self.norm2(out)))
        return torch.cat([x, out], 1)


class TorchMiniDenseNet(tnn.Module):
    """torchvision key scheme: features.conv0/norm0/denseblockI.denselayerJ.*/
    transitionI.*/norm5 + classifier."""

    def __init__(self, init_f=8, growth=4, blocks=(2, 2), num_classes=5):
        super().__init__()
        from collections import OrderedDict

        feats = OrderedDict()
        feats["conv0"] = tnn.Conv2d(3, init_f, 7, 2, 3, bias=False)
        feats["norm0"] = tnn.BatchNorm2d(init_f)
        feats["relu0"] = tnn.ReLU(inplace=True)
        feats["pool0"] = tnn.AvgPool2d(3, 2, 1)  # standard change applied
        ch = init_f
        for bi, n in enumerate(blocks):
            block = tnn.Sequential()
            for li in range(n):
                block.add_module(
                    f"denselayer{li + 1}", TorchDenseLayer(ch, growth)
                )
                ch += growth
            feats[f"denseblock{bi + 1}"] = block
            if bi != len(blocks) - 1:
                tr = tnn.Sequential()
                tr.add_module("norm", tnn.BatchNorm2d(ch))
                tr.add_module("relu", tnn.ReLU(inplace=True))
                tr.add_module("conv", tnn.Conv2d(ch, ch // 2, 1, bias=False))
                tr.add_module("pool", tnn.AvgPool2d(2, 2))
                feats[f"transition{bi + 1}"] = tr
                ch //= 2
        feats["norm5"] = tnn.BatchNorm2d(ch)
        self.features = tnn.Sequential(feats)
        self.classifier = tnn.Linear(ch, num_classes)

    def forward(self, x):
        f = self.features(x)
        out = torch.nn.functional.relu(f, inplace=True)
        out = torch.nn.functional.adaptive_avg_pool2d(out, (1, 1)).flatten(1)
        return self.classifier(out)


def _randomize_bn(model, rng):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(rng.standard_normal(m.num_features).astype(np.float32) * 0.3))
                m.running_var.copy_(torch.from_numpy((rng.random(m.num_features) + 0.5).astype(np.float32)))
                m.weight.copy_(torch.from_numpy((rng.random(m.num_features) + 0.5).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(rng.standard_normal(m.num_features).astype(np.float32) * 0.3))


def test_densenet_b1_conversion_exact(rng):
    import bcosification_tpu.bcosify.engine as eng
    from bcosification_tpu.bcosify.engine import build_bcosified_densenet
    from bcosification_tpu.models.densenet import DENSENET_CONFIGS

    tmodel = TorchMiniDenseNet()
    _randomize_bn(tmodel, rng)
    tmodel.eval()

    DENSENET_CONFIGS["densenet121"] = dict(
        growth_rate=4, block_config=(2, 2), num_init_features=8, bn_size=2
    )
    try:
        net, variables = build_bcosified_densenet(
            {
                "name": "densenet121",
                "bcosify_args": {
                    "use_bias": True,
                    "norm_layer": "BnUncV2",
                    "gap": True,
                    "act_layer": True,
                },
                "bcos_args": {"b": 1},
            },
            tmodel.state_dict(),
            input_size=32,
            num_classes=5,
        )
    finally:
        DENSENET_CONFIGS["densenet121"] = dict(
            growth_rate=32, block_config=(6, 12, 24, 16), num_init_features=64
        )

    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    mean = torch.tensor((0.485, 0.456, 0.406)).view(1, 3, 1, 1)
    std = torch.tensor((0.229, 0.224, 0.225)).view(1, 3, 1, 1)
    with torch.no_grad():
        want = tmodel((torch.from_numpy(x) - mean) / std).numpy()

    x_nhwc = x.transpose(0, 2, 3, 1)
    x6 = np.concatenate([x_nhwc, 1.0 - x_nhwc], axis=-1)
    got = np.asarray(net.apply(variables, jnp.asarray(x6))) + np.log(5 - 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

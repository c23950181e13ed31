"""End-to-end b=2 differential oracle vs the torch reference.

Builds the reference's ACTUAL BcosifyNetwork (root bcosify.py) around a
torchvision-shaped ResNet-18 with random weights — the full production
recipe (b=2, biases nulled, BnUncV2, GAP reorder, avgpool stem,
`/root/reference/bcos/experiments/ImageNet/bcosification/model.py:38-57`) —
imports the same pre-conversion state_dict through this framework's
`bcosify/torch_import.py`, and asserts that

  * logits,
  * dynamic-linear weights W(x) in explanation mode (`bcos/common.py:92-188`),
  * the rendered `gradient_to_image` RGBA output (`bcos/common.py:387-436`)

match end-to-end at fp32 tolerance. This closes the composed-detach-semantics
seam (BN var detach + ReLU + GAP-reorder + stem pooling together) that the
piecewise op/conversion/render tests cannot see.
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from reference_loader import load_reference_bcosify, reference_available  # noqa: E402

from bcosification_tpu.bcosify.engine import build_bcosified_resnet  # noqa: E402
from bcosification_tpu.explain import core as E  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

INPUT = 112
NUM_CLASSES = 1000


# --- torchvision-shaped ResNet-18 (same state_dict key scheme) with the
# --- ResNetBcos forward order: fc BEFORE avgpool (standard_models.py:36-54)


class BasicBlock(tnn.Module):
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


class TorchResNet18Bcos(tnn.Module):
    def __init__(self, num_classes=NUM_CLASSES):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 2, 1)
        self.layer2 = self._make_layer(128, 2, 2)
        self.layer3 = self._make_layer(256, 2, 2)
        self.layer4 = self._make_layer(512, 2, 2)
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )
        layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers += [BasicBlock(planes, planes) for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):  # ResNetBcos._forward_impl order
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.fc(x)  # after bcosify: 1x1 BcosifyConv2d, applied pre-GAP
        x = self.avgpool(x)
        return x.flatten(1)


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck, ResNet V1.5 (stride on the 3x3)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50MiniBcos(tnn.Module):
    """Bottleneck trunk with the same state_dict scheme as torchvision
    resnet50, narrowed (inplanes=32, one block per stage) — the production
    architecture family, Bcos forward order."""

    def __init__(self, inplanes=32, num_classes=NUM_CLASSES):
        super().__init__()
        self.inplanes = inplanes
        self.conv1 = tnn.Conv2d(3, inplanes, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(inplanes)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        w = inplanes
        self.layer1 = self._make_layer(w, 1, 1)
        self.layer2 = self._make_layer(w * 2, 1, 2)
        self.layer3 = self._make_layer(w * 4, 1, 2)
        self.layer4 = self._make_layer(w * 8, 1, 2)
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(w * 8 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    forward = TorchResNet18Bcos.forward


def _randomize_bn_stats(model, rng):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.from_numpy(
                        rng.standard_normal(m.num_features).astype(np.float32) * 0.5
                    )
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


MODEL_CONFIG = {
    "name": "resnet18",
    "weights": "RANDOM_TEST",  # truthy -> from_standard_module copies weights
    "bcosify_args": {
        "fix_b": True,
        "use_bias": False,
        "norm_layer": "BnUncV2",
        "gap": True,
        "act_layer": True,
    },
    "bcos_args": {"b": 2},
    "last_layer_name": "fc",
    "standard_changes": {"maxpool": None},  # applied manually below
    "is_bcos": True,
}


def _fresh_torch_model(arch: str, gamma_mult: float):
    torch.manual_seed(0)
    rng = np.random.default_rng(20260817)
    if arch == "resnet18":
        tmodel = TorchResNet18Bcos()
    else:
        tmodel = TorchResNet50MiniBcos(inplanes=32)
    _randomize_bn_stats(tmodel, rng)
    if gamma_mult != 1.0:
        with torch.no_grad():
            for mod in tmodel.modules():
                if isinstance(mod, tnn.BatchNorm2d):
                    mod.weight.mul_(gamma_mult)
    return tmodel, rng


def _wrap_reference(tmodel, cfg):
    ref_bcosify = load_reference_bcosify()
    ref_model = ref_bcosify.BcosifyNetwork(
        tmodel, cfg, add_channels=True, logit_layer=True
    )
    # the factory's standard_changes + bias nulling (model.py:46-55)
    ref_model.model.maxpool = tnn.AvgPool2d(3, 2, 1)
    for mod in ref_model.modules():
        if hasattr(mod, "bias") and mod.bias is not None:
            mod.bias = None
    return ref_model.eval()


def _make_pair(arch: str, mutate_fc=None):
    """Build (reference BcosifyNetwork, framework net+variables, shared input)
    for one architecture family.

    A randomly-initialised b=2 net CONTRACTS: each dynamic scale is ~|cos|<1,
    so deep stacks emit ~1e-20 logits/W — below gradient_to_image's 1e-12
    alpha floor, which then dominates the render and makes the differential
    vacuous. Calibrate by scaling BN gammas (linear in the output) until the
    pre-bias logits carry real signal, like a trained model's.

    mutate_fc(tmodel), if given, edits the pre-conversion torch model (e.g.
    reshaping fc weights so predictions spread over many classes — the
    localisation parity test needs a model that "classifies" diversely).
    """
    import bcosification_tpu.bcosify.engine as eng

    if arch == "resnet18":
        build_kwargs = dict(inplanes=64)
        layers_patch = None
    else:
        build_kwargs = dict(inplanes=32)
        layers_patch = ("bottleneck", (1, 1, 1, 1))

    cfg = {**MODEL_CONFIG, "name": arch}
    probe = None
    for gamma_mult in (1.0, 4.0, 16.0, 64.0, 256.0):
        tmodel, rng = _fresh_torch_model(arch, gamma_mult)
        if mutate_fc is not None:
            mutate_fc(tmodel)
        # snapshot BEFORE conversion: add_channels mutates weights in place
        sd = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
        ref_model = _wrap_reference(tmodel, cfg)
        if probe is None:
            probe = np.random.default_rng(99).random(
                (1, 6, INPUT, INPUT)
            ).astype(np.float32)
        with torch.no_grad():
            mag = float(
                (ref_model(torch.from_numpy(probe)) + math.log(NUM_CLASSES - 1))
                .abs()
                .max()
            )
        if 1e-2 < mag < 1e3:
            break
    assert 1e-2 < mag < 1e3, f"calibration failed for {arch}: magnitude {mag}"

    old = eng.RESNET_LAYERS.get(arch)
    if layers_patch is not None:
        eng.RESNET_LAYERS[arch] = layers_patch
    try:
        net, variables = build_bcosified_resnet(
            cfg, sd, input_size=INPUT, num_classes=NUM_CLASSES, **build_kwargs
        )
    finally:
        if layers_patch is not None:
            eng.RESNET_LAYERS[arch] = old

    x = rng.random((2, 3, INPUT, INPUT)).astype(np.float32)
    x6 = np.concatenate([x, 1.0 - x], axis=1)  # AddInverse, NCHW
    return ref_model, net, variables, x6, rng


@pytest.fixture(
    scope="module", params=["resnet18", "resnet50"], ids=["rn18-basic", "rn50-bottleneck"]
)
def e2e(request):
    return _make_pair(request.param)


def test_b2_e2e_logits(e2e):
    ref_model, net, variables, x6, _ = e2e
    with torch.no_grad():
        t_logits = ref_model(torch.from_numpy(x6)).numpy()
    j_logits = np.asarray(
        net.apply(variables, jnp.asarray(x6.transpose(0, 2, 3, 1)))
    )
    # atol covers fp32 reassociation through 16+ conv/BN layers (observed
    # max ~3e-5 at calibrated magnitudes)
    np.testing.assert_allclose(j_logits, t_logits, rtol=2e-4, atol=1e-4)


def test_b2_e2e_explain_W_and_rendering(e2e):
    ref_model, net, variables, x6, _ = e2e
    idx = 7  # fixed class: decouples the W(x) comparison from argmax ties

    xt = torch.from_numpy(x6[:1]).clone().requires_grad_(True)
    t_res = ref_model.explain(xt, idx=idx)
    t_W = t_res["dynamic_linear_weights"].detach().numpy()[0].transpose(1, 2, 0)
    t_contrib = t_res["contribution_map"].detach().numpy()[0]
    t_rgba = np.asarray(t_res["explanation"])

    x6_j = jnp.asarray(x6[:1].transpose(0, 2, 3, 1))
    j_res = E.explain(net, variables, x6_j, idx=idx)
    j_W = np.asarray(j_res["dynamic_linear_weights"][0])
    j_contrib = np.asarray(j_res["contribution_map"][0])
    j_rgba = np.asarray(j_res["explanation"])

    assert j_res["prediction"] == int(t_res["prediction"])
    scale = np.abs(t_W).max()
    np.testing.assert_allclose(j_W, t_W, rtol=1e-4, atol=1e-5 * max(scale, 1.0))
    np.testing.assert_allclose(
        j_contrib, t_contrib, rtol=1e-4, atol=1e-5 * max(np.abs(t_contrib).max(), 1.0)
    )
    # RGB fold pos/(pos+inv) is 0/0-indeterminate where W ~ 0 in BOTH
    # frameworks — compare colour only at pixels carrying signal; alpha
    # (the visible channel) everywhere.
    # alpha passes through a 99.5-percentile clip whose threshold is itself
    # computed from W — a 1e-6 W difference shifts the clip boundary, so the
    # alpha tolerance is looser than the 1e-5 W tolerance above
    np.testing.assert_allclose(j_rgba[..., 3], t_rgba[..., 3], rtol=2e-2, atol=1e-2)
    vis = np.abs(t_W).max(-1) > 1e-3 * scale
    assert vis.mean() > 0.05  # sanity: the masked comparison is not vacuous
    # a single CHANNEL pair can still sit at pos~inv~0 under an otherwise
    # visible pixel (fold flips on rounding in both frameworks) — require
    # 99.99% agreement instead of every element
    ok = np.isclose(j_rgba[vis][:, :3], t_rgba[vis][:, :3], rtol=1e-3, atol=1e-3)
    assert ok.mean() > 0.9999, f"rgb agreement only {ok.mean():.6f}"

    # the explained logit itself must agree (completeness w.r.t. raw x does
    # not hold for BcosifyNetwork: the 0th-layer Normalize mean and the
    # LogitLayer bias are input-independent offsets in BOTH frameworks)
    with torch.no_grad():
        t_logit = float(ref_model(xt)[0, idx])
    j_logit = float(np.asarray(j_res["logits"])[0, idx])
    np.testing.assert_allclose(j_logit, t_logit, rtol=1e-4, atol=1e-5)

"""End-to-end b=2 differential for the DenseNet conversion family.

Completes the conversion-family matrix (RN basic/bottleneck, CLIP, ViT,
from-scratch zoo): the reference's root bcosify.py over a DenseNetBcos-shaped
torch model (classifier-as-1x1-conv before GAP, `/root/reference/bcos/models/
standard_models.py:56-63`, factory `ImageNet/bcosification/model.py:30-36`
with last_layer_name='classifier') vs build_bcosified_densenet — logits and
explain-mode W(x) at the production recipe.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from reference_loader import load_reference_bcosify, reference_available  # noqa: E402
from test_densenet_conversion import TorchMiniDenseNet, _randomize_bn  # noqa: E402

from bcosification_tpu.explain import core as E  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

NC, INPUT = 1000, 64  # 1000 classes: the reference LogitLayer hardcodes -log(999)


class TorchMiniDenseNetBcos(TorchMiniDenseNet):
    def forward(self, x):  # DenseNetBcos order (standard_models.py:56-63)
        f = self.features(x)
        out = F.relu(f, inplace=True)
        out = self.classifier(out)  # after bcosify: 1x1 BcosifyConv2d, pre-GAP
        out = F.adaptive_avg_pool2d(out, (1, 1))
        return torch.flatten(out, 1)


MODEL_CONFIG = {
    "name": "densenet121",
    "weights": "RANDOM_TEST",
    "last_layer_name": "classifier",
    "bcosify_args": {
        "fix_b": True,
        "use_bias": False,
        "norm_layer": "BnUncV2",
        "gap": True,
        "act_layer": True,
    },
    "bcos_args": {"b": 2},
    "is_bcos": True,
}


@pytest.fixture(scope="module")
def dn():
    import bcosification_tpu.bcosify.engine as eng  # noqa: F401
    from bcosification_tpu.bcosify.engine import build_bcosified_densenet
    from bcosification_tpu.models.densenet import DENSENET_CONFIGS

    rng = np.random.default_rng(0)
    torch.manual_seed(3)
    # gamma gain keeps the deep b=2 stack out of the contraction regime
    tmodel = TorchMiniDenseNetBcos(init_f=8, growth=4, blocks=(2, 2), num_classes=NC)
    _randomize_bn(tmodel, rng)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.mul_(4.0)
    tmodel.eval()
    sd = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    ref_bcosify = load_reference_bcosify()
    ref = ref_bcosify.BcosifyNetwork(
        tmodel, MODEL_CONFIG, add_channels=True, logit_layer=True
    )
    # the factory's bias nulling (model.py:51-55); the densenet standard
    # change (features[3] -> AvgPool2d(3,2,1)) is pre-applied by the mini arch
    for mod in ref.modules():
        if hasattr(mod, "bias") and mod.bias is not None:
            mod.bias = None
    ref.eval()

    old = DENSENET_CONFIGS["densenet121"]
    DENSENET_CONFIGS["densenet121"] = dict(
        growth_rate=4, block_config=(2, 2), num_init_features=8, bn_size=2
    )
    try:
        net, variables = build_bcosified_densenet(
            MODEL_CONFIG, sd, input_size=INPUT, num_classes=NC
        )
    finally:
        DENSENET_CONFIGS["densenet121"] = old

    x = rng.random((2, 3, INPUT, INPUT)).astype(np.float32)
    x6 = np.concatenate([x, 1.0 - x], axis=1)

    # non-degeneracy guard
    with torch.no_grad():
        pre = ref(torch.from_numpy(x6)) + float(np.log(NC - 1))
    assert float(pre.abs().max()) > 1e-3, float(pre.abs().max())
    return ref, net, variables, x6


def test_densenet_b2_e2e_logits(dn):
    ref, net, variables, x6 = dn
    with torch.no_grad():
        want = ref(torch.from_numpy(x6)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x6.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_densenet_b2_e2e_explain_W(dn):
    ref, net, variables, x6 = dn
    idx = 11
    xt = torch.from_numpy(x6[:1]).clone().requires_grad_(True)
    t_res = ref.explain(xt, idx=idx)
    t_W = t_res["dynamic_linear_weights"].detach().numpy()[0].transpose(1, 2, 0)

    j_res = E.explain(net, variables, jnp.asarray(x6[:1].transpose(0, 2, 3, 1)), idx=idx)
    j_W = np.asarray(j_res["dynamic_linear_weights"][0])
    assert j_res["prediction"] == int(t_res["prediction"])
    scale = max(np.abs(t_W).max(), 1e-9)
    np.testing.assert_allclose(j_W, t_W, rtol=1e-4, atol=1e-5 * scale)

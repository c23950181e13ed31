"""Interpretability analyses tests: explainer registry, localisation grid
pointing game on a synthetic perfectly-localisable model, text localisation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.interpretability.analyses.localisation import (
    LocalisationAnalyser,
    make_multi_image,
)
from bcosification_tpu.interpretability.explanation_methods import (
    explainer_map,
    get_explainer,
)
from bcosification_tpu.modules import BcosConv2d


class CellSumModel(nn.Module):
    """Logit c = mean of channel c over the image — a model whose 'evidence'
    for class c is exactly the input intensity in channel c. With one-hot-
    channel class images, attributions must localise perfectly."""

    num_classes: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        return x[..., : self.num_classes].mean(axis=(1, 2))


class OneHotChannelDataset:
    """Image i lights up channel (i % num_classes) in all pixels."""

    def __init__(self, n=32, size=8, num_classes=4, channels=6):
        self.n, self.size, self.num_classes, self.channels = n, size, num_classes, channels

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        c = i % self.num_classes
        img = np.zeros((self.size, self.size, self.channels), np.float32)
        img[..., c] = 1.0
        return img, np.int32(c)


def test_make_multi_image_layout():
    ds = OneHotChannelDataset(num_classes=4)
    grid, tgts, offset = make_multi_image(4, ds, offset=0)
    assert grid.shape == (1, 16, 16, 6)
    assert sorted(tgts) == [0, 1, 2, 3]
    s, h = 2, 8
    for i, t in enumerate(tgts):
        row, col = i % s, i // s
        cell = grid[0, row * h : (row + 1) * h, col * h : (col + 1) * h]
        assert cell[..., t].min() == 1.0


# Grad (raw saliency) is spatially uniform for this model by construction, so
# only the input-weighted methods localise perfectly
@pytest.mark.parametrize("explainer_name", ["Ours", "IxG", "IntGrad"])
def test_gradient_explainers_localise(explainer_name, tmp_path):
    # 5 classes > n_imgs=4: the sampler (reference localisation.py:212,
    # `while mask.sum() > n_imgs`) only emits blocks while STRICTLY more
    # than n_imgs classes remain eligible
    model = CellSumModel(num_classes=5)
    variables = {"params": {}}
    ds = OneHotChannelDataset(n=30, num_classes=5)
    analyser = LocalisationAnalyser(
        model,
        variables,
        ds,
        save_folder=tmp_path,
        explainer_name=explainer_name,
        sample_size=2,
        n_imgs=4,
        smooth=0,
        conf_thresh=None,
        batch_size=8,
    )
    results = analyser.run()
    metric = results["localisation_metric"]
    assert len(metric) == 8
    # the synthetic model localises perfectly
    np.testing.assert_allclose(metric, 1.0, atol=1e-5)


def test_localisation_striding_mode(tmp_path):
    """Striding (reference localisation.py:282-305): overlapping-crop
    attribute+fold. With stride dividing the crop size, every pixel is covered
    by the same number of crops, so the perfectly-localisable model still
    scores 1.0; the fold must also reproduce the full-image attribution map's
    cell structure."""
    model = CellSumModel(num_classes=5)
    variables = {"params": {}}
    ds = OneHotChannelDataset(n=30, num_classes=5)
    analyser = LocalisationAnalyser(
        model,
        variables,
        ds,
        save_folder=tmp_path,
        explainer_name="IxG",
        sample_size=1,
        n_imgs=4,
        smooth=0,
        conf_thresh=None,
        striding="4",
        batch_size=8,
    )
    results = analyser.run()
    metric = results["localisation_metric"]
    assert len(metric) == 4
    np.testing.assert_allclose(metric, 1.0, atol=1e-5)


def test_localisation_real_shape_grid(tmp_path):
    """Real eval shapes (224px images, 3x3 grid => a 672x672 multi-image),
    full-image AND strided attribution — catches shape/striding regressions
    the 8px fixtures can't (VERDICT r4 #9; ref localisation.py:282-305
    strided attribute+fold). The perfectly-localisable model must still
    score ~1.0 at real shapes; smoothing (the real config's smooth=15) only
    blurs cell borders. (~6 s: the model is trivial, the SHAPES are real —
    cheap enough for the quick pass.)"""
    model = CellSumModel(num_classes=10)
    variables = {"params": {}}
    ds = OneHotChannelDataset(n=40, size=224, num_classes=10, channels=10)
    analyser = LocalisationAnalyser(
        model,
        variables,
        ds,
        save_folder=tmp_path / "full",
        explainer_name="IxG",
        sample_size=1,
        n_imgs=9,
        smooth=15,
        conf_thresh=None,
        batch_size=2,
    )
    results = analyser.run()
    metric = results["localisation_metric"]
    assert len(metric) == 9
    assert np.min(metric) > 0.95, metric

    strided = LocalisationAnalyser(
        model,
        variables,
        ds,
        save_folder=tmp_path / "strided",
        explainer_name="IxG",
        sample_size=1,
        n_imgs=9,
        smooth=0,
        conf_thresh=None,
        striding="112",
        batch_size=2,
    )
    results_s = strided.run()
    metric_s = results_s["localisation_metric"]
    assert len(metric_s) == 9
    # stride 112 divides the 224 crop: uniform coverage, perfect score holds
    np.testing.assert_allclose(metric_s, 1.0, atol=1e-5)


def test_localisation_config_grid_names():
    from bcosification_tpu.interpretability.analyses.localisation_configs import (
        configs,
    )

    # reference grid shape: 3 sizes x 2 grids x rescale x conf x 6 stridings x neg
    assert len(configs) == 3 * 2 * 2 * 2 * 6 * 2
    c = configs["250_3x3_rescale_noconfthresh-stride=14-neg"]
    assert c["do_rescale"] and c["neg"] and c["striding"] == "14"
    assert c["conf_thresh"] == 0.0 and c["n_imgs"] == 9


def test_blackbox_explainers_run(rng):
    model = CellSumModel()
    variables = {"params": {}}
    img = jnp.asarray(rng.random((1, 16, 16, 6)).astype(np.float32))
    for name in ["Occlusion", "Rise", "Lime"]:
        expl = get_explainer(
            model, variables, name,
            **({"patch_size": 4, "stride": 4} if name == "Occlusion" else
               {"n_masks": 50} if name == "Rise" else {"n_samples": 50, "cell_size": 4}),
        )
        atts = expl.attribute_selection(img, [0, 1])
        assert np.asarray(atts).shape == (2, 16, 16, 6)
        assert np.isfinite(np.asarray(atts)).all()


def test_rise_masks_reference_semantics():
    """RISE masks follow the reference construction (ref rise.py:40-54):
    bilinear-smoothed cells of period ceil(H/s) — NOT 2x — with full-image
    grid coverage (r5 review: kron with doubled blocks left half the grid
    off-image and phase-locked the offsets)."""
    from bcosification_tpu.interpretability.explanation_methods.explainers import Rise

    r = Rise(model=None, variables=None, n_masks=64, cell_size=7, seed=0)
    masks = r._masks(224, 224)
    assert masks.shape == (64, 224, 224)
    assert masks.min() >= 0.0 and masks.max() <= 1.0
    # bilinear upsample -> intermediate values between cells, not a 0/1 kron
    frac = np.mean((masks > 0.05) & (masks < 0.95))
    assert frac > 0.1, f"masks look blocky (frac intermediate {frac})"
    # cell period ~= ceil(224/7)=32: a mask's autocovariance along x must
    # decay by half within one cell, impossible with 64-px blocks
    m = masks[0] - masks[0].mean()
    ac = [float(np.mean(m[:, :-d] * m[:, d:])) for d in (1, 32)]
    assert ac[1] < 0.5 * ac[0], ac
    # every grid cell influences the image: per-mask coverage mean ~= p
    assert abs(float(masks.mean()) - 0.5) < 0.1


def test_bcos_ours_completeness_on_grid(rng, tmp_path):
    """Ours on a real bias-free B-cos net: localisation metric well above the
    1/n chance level for class-separable inputs."""

    class TinyBcos(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            x = BcosConv2d(features=8, kernel_size=3, padding=1)(x, train=train, explain=explain)
            x = BcosConv2d(features=4, kernel_size=1)(x, train=train, explain=explain)
            return x.mean(axis=(1, 2))

    model = TinyBcos()
    ds = OneHotChannelDataset(n=16)
    x0 = jnp.asarray(ds[0][0][None])
    variables = model.init(jax.random.PRNGKey(0), x0)
    expl = get_explainer(model, variables, "Ours")
    grid, tgts, _ = make_multi_image(4, ds, offset=0)
    atts = np.asarray(expl.attribute_selection(jnp.asarray(grid), jnp.asarray(tgts)))
    assert atts.shape == (4, 16, 16, 6)
    assert np.isfinite(atts).all()


def test_text_localisation_shapes(rng):
    from bcosification_tpu.interpretability.analyses.text_localisation import (
        compute_attributions,
    )

    class TinyEncoder(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            x = BcosConv2d(features=8, kernel_size=3, stride=2, padding=1)(
                x, train=train, explain=explain
            )
            return x.mean(axis=(1, 2))

    model = TinyEncoder()
    img = jnp.asarray(rng.random((1, 16, 16, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    emb = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    emb = emb / jnp.linalg.norm(emb)
    res = compute_attributions(model, variables, emb, img)
    assert res["contribution_map"].shape == (16, 16)
    assert res["explanation"].shape == (16, 16, 4)
    # the cosine normalisation is differentiable (ref text_localisation.py:77)
    # and the explain-mode tower is dynamic-linear in x, so the score is
    # 0-homogeneous: input x gradient contributions sum to ~0 (Euler), and
    # x . grad score directly vanishes relative to the gradient's own scale
    wx = float(res["contribution_map"].sum())
    scale = float(np.abs(res["contribution_map"]).sum()) + 1e-12
    assert abs(wx) / scale < 1e-4, (wx, scale)
    assert np.isfinite(res["vrange"])


class _ReluMLP(nn.Module):
    """Dense -> ReLU -> Dense, with the model-path ReLU module so GuidedBackprop
    can gate it."""

    w1: np.ndarray
    w2: np.ndarray

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        from bcosification_tpu.modules.activations import ReLU

        h = x.reshape((x.shape[0], -1)) @ jnp.asarray(self.w1)
        h = ReLU()(h, train=train, explain=explain)
        return h @ jnp.asarray(self.w2)


def test_guided_backprop_matches_manual_gating(rng):
    """GB on Dense->ReLU->Dense must equal the hand-computed guided gradient:
    at the ReLU, only positive grads through positively-activated units."""
    from bcosification_tpu.interpretability.explanation_methods import get_explainer

    din, dh, dout = 12, 16, 5
    w1 = rng.standard_normal((din, dh)).astype(np.float32)
    w2 = rng.standard_normal((dh, dout)).astype(np.float32)
    x = rng.standard_normal((1, din)).astype(np.float32)
    model = _ReluMLP(w1=w1, w2=w2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    t = 2
    gb = get_explainer(model, variables, "GB")
    got = np.asarray(gb.attribute_selection(jnp.asarray(x), jnp.asarray([t])))[0]

    h = x[0] @ w1
    g_h = w2[:, t]  # upstream grad at the ReLU output
    gated = np.where((h > 0) & (g_h > 0), g_h, 0.0)
    want = w1 @ gated
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-5, atol=1e-6)

    # and it differs from plain Grad (some unit has h>0, g_h<0 or vice versa)
    grad = get_explainer(model, variables, "Grad")
    vanilla = np.asarray(grad.attribute_selection(jnp.asarray(x), jnp.asarray([t])))[0]
    assert np.abs(got - vanilla).max() > 1e-4

    # guided mode must not leak: Grad traced AFTER GB still matches autodiff
    want_vanilla = w1 @ np.where(h > 0, g_h, 0.0)
    np.testing.assert_allclose(vanilla.reshape(-1), want_vanilla, rtol=1e-5, atol=1e-6)


def test_guided_backprop_on_bcosified_relu_net(rng):
    """GB != Grad on a bcos net WITH ReLUs (act_layer=True keeps them,
    ref bcosify.py:110-114); GB == Grad on the ReLU-free variant."""
    from bcosification_tpu.interpretability.explanation_methods import get_explainer
    from bcosification_tpu.modules.activations import ReLU, Identity

    class TinyBcosNet(nn.Module):
        with_relu: bool

        @nn.compact
        def __call__(self, x, *, train: bool = False, explain: bool = False):
            act = ReLU if self.with_relu else Identity
            x = BcosConv2d(features=8, kernel_size=3, padding=1)(
                x, train=train, explain=explain
            )
            x = act()(x, train=train, explain=explain)
            x = BcosConv2d(features=4, kernel_size=1)(
                x, train=train, explain=explain
            )
            return x.mean(axis=(1, 2))

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))

    relu_net = TinyBcosNet(with_relu=True)
    v = relu_net.init(jax.random.PRNGKey(1), x)
    gb = get_explainer(relu_net, v, "GB")
    gr = get_explainer(relu_net, v, "Grad")
    a_gb = np.asarray(gb.attribute_selection(x, jnp.asarray([1])))
    a_gr = np.asarray(gr.attribute_selection(x, jnp.asarray([1])))
    assert np.abs(a_gb - a_gr).max() > 1e-6, "GB must gate ReLU grads"

    free_net = TinyBcosNet(with_relu=False)
    v2 = free_net.init(jax.random.PRNGKey(1), x)
    gb2 = get_explainer(free_net, v2, "GB")
    gr2 = get_explainer(free_net, v2, "Grad")
    np.testing.assert_allclose(
        np.asarray(gb2.attribute_selection(x, jnp.asarray([1]))),
        np.asarray(gr2.attribute_selection(x, jnp.asarray([1]))),
        rtol=1e-6, atol=1e-7,
    )


def test_deeplift_zero_baseline_equals_ixg_on_relu_net(rng):
    """Rescale with a zero baseline on a bias-free ReLU net degenerates to
    the ordinary ReLU gradient, so DeepLIFT == IxG exactly there."""
    from bcosification_tpu.modules.activations import ReLU

    class TinyReluNet(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False, explain: bool = False):
            x = BcosConv2d(features=8, kernel_size=3, padding=1)(
                x, train=train, explain=explain
            )
            x = ReLU()(x, train=train, explain=explain)
            x = BcosConv2d(features=4, kernel_size=1)(
                x, train=train, explain=explain
            )
            return x.mean(axis=(1, 2))

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))
    net = TinyReluNet()
    v = net.init(jax.random.PRNGKey(2), x)
    dl = get_explainer(net, v, "DeepLIFT")
    ixg = get_explainer(net, v, "IxG")
    a_dl = np.asarray(dl.attribute_selection(x, jnp.asarray([1, 2])))
    a_ixg = np.asarray(ixg.attribute_selection(x, jnp.asarray([1, 2])))
    np.testing.assert_allclose(a_dl, a_ixg, rtol=1e-5, atol=1e-7)


def _bcosified_rn50(b, rng_key=0):
    from bcosification_tpu.bcosify.engine import build_bcosified_resnet, RESNET_LAYERS

    model_config = {
        "name": "resnet50",
        "bcosify_args": {
            "fix_b": True, "use_bias": False, "norm_layer": "BnUncV2",
            "gap": True, "act_layer": True,
        },
        "bcos_args": {"b": b},
    }
    old = RESNET_LAYERS["resnet50"]
    RESNET_LAYERS["resnet50"] = ("bottleneck", (1, 1))
    try:
        return build_bcosified_resnet(
            model_config, None, input_size=32, num_classes=10, inplanes=8
        )
    finally:
        RESNET_LAYERS["resnet50"] = old


def test_deeplift_completeness_and_nonzero_baseline(rng):
    """Summation-to-delta sum(attr) == f(x) - f(baseline):
    exact when ReLU is the only nonlinearity (a b=1 conversion — rescale
    covers everything); approximate on b=2 where the dynamic scales use the
    gradient fallback (captum's Rescale behaves identically on ops it does
    not recognise). The LogitLayer bias cancels in the delta."""
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    baseline = jnp.full_like(x, 0.3)
    t = 3

    def run(b):
        net, variables = _bcosified_rn50(b)
        dl = get_explainer(
            net, variables, "DeepLIFT", baseline=baseline, explanation_mode=True
        )
        attr = np.asarray(dl.attribute_selection(x, jnp.asarray([t])))[0]
        fx = float(net.apply(variables, x, train=False, explain=True)[0, t])
        f0 = float(net.apply(variables, baseline, train=False, explain=True)[0, t])
        return net, variables, attr, fx - f0

    net1, _, attr1, delta1 = run(1)
    np.testing.assert_allclose(attr1.sum(), delta1, rtol=1e-4, atol=1e-7)

    net2, v2, attr2, delta2 = run(2)
    denom = max(abs(delta2), 1e-8)
    assert abs(attr2.sum() - delta2) / denom < 0.25  # fallback: approximate

    ixg = get_explainer(net2, v2, "IxG")
    a_ixg = np.asarray(ixg.attribute_selection(x, jnp.asarray([t])))[0]
    assert np.abs(attr2 - a_ixg).max() > 1e-8


def test_deeplift_in_registry():
    assert "DeepLIFT" in explainer_map and "DeepLift" in explainer_map


def test_localisation_cli_arg_surface():
    """The runnable localisation CLI keeps the reference's flag names
    (ref localisation.py:476-541)."""
    from bcosification_tpu.interpretability.analyses.localisation import (
        argument_parser,
    )

    parser = argument_parser()
    flags = {a for act in parser._actions for a in act.option_strings}
    for ref_flag in (
        "--save_path", "--reload", "--ema", "--explainer_name",
        "--analysis_config", "--striding", "--explainer_config",
        "--batch_size", "--smooth", "--force_confidence_calculation",
        "--debug",
    ):
        assert ref_flag in flags, ref_flag
    args = parser.parse_args(
        ["--experiment_name", "resnet_18", "--smooth", "15"]
    )
    assert args.smooth == 15 and args.analysis_config == "500_3x3"


def test_text_localisation_cli_arg_surface():
    """Runnable text-localisation CLI keeps the reference flag names
    (ref text_localisation.py:168-182)."""
    from bcosification_tpu.interpretability.analyses.text_localisation import (
        argument_parser,
    )

    parser = argument_parser()
    flags = {a for act in parser._actions for a in act.option_strings}
    for ref_flag in (
        "--exp_name", "--text_to_localize", "--exp_name_data",
        "--image_index", "--use_attn_unpool", "--pool_cosine",
        "--norm_max_cosine", "--smooth", "--random_img_path",
        "--use_class_name", "--save_path",
    ):
        assert ref_flag in flags, ref_flag
    args = parser.parse_args(
        ["--exp_name", "x", "--text_to_localize", "a dog,a cat"]
    )
    assert args.pool_cosine == 1 and args.image_index == 11

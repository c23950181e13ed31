"""Load individual reference (PyTorch) source files for parity tests WITHOUT
importing the full `bcos` package (whose __init__ needs torchvision, which is
not installed here).

We register stub parent packages pointing at /root/reference so that only the
leaf modules we need (and their torch-only deps) get executed. Used purely as a
numerical oracle in tests — the framework itself never imports these.
"""
import importlib
import importlib.util
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "bcos").is_dir()


_STUBBED = False


def _stub_packages():
    global _STUBBED
    if _STUBBED:
        return
    for name, path in [
        ("bcos", REFERENCE / "bcos"),
        ("bcos.modules", REFERENCE / "bcos" / "modules"),
        ("bcos.modules.norms", REFERENCE / "bcos" / "modules" / "norms"),
        (
            "bcos.modules.norms.uncentered_norms",
            REFERENCE / "bcos" / "modules" / "norms" / "uncentered_norms",
        ),
        ("bcos.training", REFERENCE / "bcos" / "training"),
        ("bcos.models", REFERENCE / "bcos" / "models"),
        ("bcos.data", REFERENCE / "bcos" / "data"),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [str(path)]
            sys.modules[name] = mod
    _STUBBED = True


def load_reference(name: str):
    """Import e.g. 'bcos.modules.bcosconv2d' from the reference tree."""
    _stub_packages()
    return importlib.import_module(name)


def _stub_torchvision():
    """Minimal torchvision.transforms.Normalize so the reference's root
    bcosify.py / bcosify_vit.py import without torchvision (not installed
    here). Semantics are exactly torchvision's: channelwise (x - mean) / std,
    differentiable."""
    if "torchvision" in sys.modules:
        return
    import torch

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = mean
            self.std = std

        def __call__(self, t):
            mean = torch.as_tensor(self.mean, dtype=t.dtype, device=t.device)
            std = torch.as_tensor(self.std, dtype=t.dtype, device=t.device)
            shape = [1] * (t.ndim - 3) + [-1, 1, 1]
            return (t - mean.view(shape)) / std.view(shape)

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvt.Normalize = Normalize
    tvt.functional = tvf  # imported (unused) by bcosify_vit.py:8
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf


def _stub_torchvision_presets():
    """Extend the torchvision stub far enough to import the reference's
    `bcos/data/presets.py` (autoaugment classes, InterpolationMode,
    `torchvision.utils.make_grid`, functional helpers). The transform objects
    are inert records: CONFIGS construction only *instantiates* them, it never
    applies them, so parity tests over config grids need no real torchvision."""
    import enum

    _stub_torchvision()
    tv = sys.modules["torchvision"]
    tvt = sys.modules["torchvision.transforms"]
    tvf = sys.modules["torchvision.transforms.functional"]
    if hasattr(tvt, "autoaugment"):
        return

    class InterpolationMode(str, enum.Enum):
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    tvf.InterpolationMode = InterpolationMode
    tvf.get_dimensions = lambda img: list(img.shape[-3:])
    tvf.normalize = lambda t, mean, std, inplace=False: tvt.Normalize(mean, std)(t)

    def _record(name):
        def __init__(self, *a, **k):
            self.args, self.kwargs = a, k

        def __call__(self, x, *a, **k):
            return x

        return type(name, (), {"__init__": __init__, "__call__": __call__})

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    tvt.Compose = Compose
    for n in [
        "CenterCrop",
        "ConvertImageDtype",
        "PILToTensor",
        "RandomCrop",
        "RandomErasing",
        "RandomHorizontalFlip",
        "RandomResizedCrop",
        "Resize",
        "ToTensor",
    ]:
        setattr(tvt, n, _record(n))
    tvt.transforms = tvt  # `transforms.transforms.X` spelling
    sys.modules["torchvision.transforms.transforms"] = tvt

    aug = types.ModuleType("torchvision.transforms.autoaugment")
    for n in ["AugMix", "AutoAugment", "RandAugment", "TrivialAugmentWide"]:
        setattr(aug, n, _record(n))

    class AutoAugmentPolicy(str, enum.Enum):
        IMAGENET = "imagenet"
        CIFAR10 = "cifar10"
        SVHN = "svhn"

    aug.AutoAugmentPolicy = AutoAugmentPolicy
    tvt.autoaugment = aug
    sys.modules["torchvision.transforms.autoaugment"] = aug

    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: None
    tv.utils = tvu
    sys.modules["torchvision.utils"] = tvu


def _stub_torchmetrics_and_lightning():
    """`bcos.experiments.utils` drags in torchmetrics (metric_utils) and
    pytorch_lightning (optimizer_factory) at import time; neither is installed.
    Config-grid construction never calls into them, so any-attribute stubs
    suffice."""

    class _Anything:
        def __init__(self, *a, **k):
            pass

    def _module_getattr(name):
        # dunder lookups (__file__, __spec__, ...) must fail normally or
        # inspect/importlib machinery scanning sys.modules breaks
        if name.startswith("__"):
            raise AttributeError(name)
        return _Anything

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm.__getattr__ = _module_getattr
        sys.modules["torchmetrics"] = tm
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        plc = types.ModuleType("pytorch_lightning.core")
        plo = types.ModuleType("pytorch_lightning.core.optimizer")
        plo.LightningOptimizer = _Anything
        pl.core = plc
        plc.optimizer = plo
        sys.modules.update(
            {
                "pytorch_lightning": pl,
                "pytorch_lightning.core": plc,
                "pytorch_lightning.core.optimizer": plo,
            }
        )


def load_reference_experiment_configs(dataset: str, base_network: str):
    """Import the reference's `bcos.experiments.<dataset>.<base_network>.
    experiment_parameters` and return its CONFIGS dict (the combinatorial
    experiment grid, e.g. `ImageNet/bcosification/experiment_parameters.py:
    82-135`). Used to assert the new framework reproduces the full config-name
    grid and its headline hyperparameters."""
    _stub_packages()
    _stub_torchvision_presets()
    _stub_torchmetrics_and_lightning()

    # `from bcos.modules import norms / DetachableGNLayerNorm2d / ...` without
    # running the real bcos.modules.__init__: populate the stub namespace.
    mods = sys.modules["bcos.modules"]
    norms_stub = sys.modules["bcos.modules.norms"]
    if not hasattr(norms_stub, "NoBias"):
        for modname in (
            "bcos.modules.norms.centered_norms",
            "bcos.modules.norms.uncentered_norms.batchnorm_uncentered",
            "bcos.modules.norms.uncentered_norms.allnorm_uncentered",
            "bcos.modules.norms.uncentered_norms.groupnorm_uncentered",
            "bcos.modules.norms.uncentered_norms.posnorm_uncentered",
            "bcos.modules.norms.utils",
        ):
            m = load_reference(modname)
            for a in getattr(m, "__all__", []):
                setattr(norms_stub, a, getattr(m, a))
    mods.norms = norms_stub
    if not hasattr(mods, "DetachableGNLayerNorm2d"):
        centered = load_reference("bcos.modules.norms.centered_norms")
        mods.DetachableGNLayerNorm2d = centered.DetachableGNLayerNorm2d
        mods.DetachableModule = load_reference("bcos.modules.common").DetachableModule

    # bcos.experiments as a path-only stub package: the real
    # `bcos/experiments/utils/__init__.py` and the per-(dataset, base_network)
    # experiment_parameters modules then import normally underneath it.
    if "bcos.experiments" not in sys.modules:
        exp = types.ModuleType("bcos.experiments")
        exp.__path__ = [str(REFERENCE / "bcos" / "experiments")]
        sys.modules["bcos.experiments"] = exp

    mod = importlib.import_module(
        f"bcos.experiments.{dataset}.{base_network}.experiment_parameters"
    )
    return mod.CONFIGS


def load_reference_bcosify():
    """Import the reference's ROOT-level bcosify.py (the BcosifyNetwork module
    rewriter, `/root/reference/bcosify.py`) with its torchvision / CLIP / bcos
    package imports satisfied from the reference tree. Used as the end-to-end
    b=2 oracle."""
    if "bcosify" in sys.modules:
        return sys.modules["bcosify"]
    _stub_packages()
    _stub_torchvision()
    for name, path in [
        ("CLIP", REFERENCE / "CLIP"),
        ("CLIP.clip", REFERENCE / "CLIP" / "clip"),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [str(path)]
            sys.modules[name] = mod
    # bcosify.py does `from bcos.modules import ...` / `from ...uncentered_norms
    # import ...` — populate the stub packages with exactly those attrs (the
    # real __init__ files would drag in every module).
    mods = sys.modules["bcos.modules"]
    if not hasattr(mods, "LogitLayer"):
        mods.BcosAttentionPool2d = load_reference(
            "bcos.modules.bcosattnpool"
        ).BcosAttentionPool2d
        common = load_reference("bcos.modules.common")
        mods.BcosSequential = common.BcosSequential
        mods.LogitLayer = load_reference("bcos.modules.logitlayer").LogitLayer
    unc = sys.modules["bcos.modules.norms.uncentered_norms"]
    if not hasattr(unc, "BatchNormUncentered2d"):
        unc.BatchNormUncentered2d = load_reference(
            "bcos.modules.norms.uncentered_norms.batchnorm_uncentered"
        ).BatchNormUncentered2d
    spec = importlib.util.spec_from_file_location(
        "bcosify", REFERENCE / "bcosify.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bcosify"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_from_scratch_models():
    """Import the reference's from-scratch model zoo (`bcos.models.resnet`
    etc.), satisfying its `from bcos.modules import ...`, norms-namespace and
    `torchvision.ops.StochasticDepth` imports from the reference tree."""
    _stub_packages()
    _stub_torchvision()
    tv = sys.modules["torchvision"]
    if "torchvision.ops" not in sys.modules:
        ops_mod = types.ModuleType("torchvision.ops")
        # the reference vendors exactly this implementation
        ops_mod.StochasticDepth = load_reference(
            "bcos.modules.stochastic_depth"
        ).StochasticDepth
        tv.ops = ops_mod
        sys.modules["torchvision.ops"] = ops_mod
    mods = sys.modules["bcos.modules"]
    for attr, modname in [
        ("BcosConv2d", "bcos.modules.bcosconv2d"),
        ("BcosLinear", "bcos.modules.bcoslinear"),
        ("LogitLayer", "bcos.modules.logitlayer"),
    ]:
        if not hasattr(mods, attr):
            setattr(mods, attr, getattr(load_reference(modname), attr))
    norms_stub = sys.modules["bcos.modules.norms"]
    if not hasattr(norms_stub, "NoBias"):
        for modname in (
            "bcos.modules.norms.centered_norms",
            "bcos.modules.norms.uncentered_norms.batchnorm_uncentered",
            "bcos.modules.norms.uncentered_norms.allnorm_uncentered",
            "bcos.modules.norms.uncentered_norms.groupnorm_uncentered",
            "bcos.modules.norms.uncentered_norms.posnorm_uncentered",
            "bcos.modules.norms.utils",
        ):
            m = load_reference(modname)
            for a in getattr(m, "__all__", []):
                setattr(norms_stub, a, getattr(m, a))
    mods.norms = norms_stub
    return load_reference("bcos.models.resnet")


def load_reference_bcosify_vit():
    """Import the reference's ROOT-level bcosify_vit.py (the ViT rewriter:
    patch-embed channel doubling, Linear->BcosifyLinear except to_qkv,
    GELU->MyGELU, LN->DetachableLayerNorm)."""
    if "bcosify_vit" in sys.modules:
        return sys.modules["bcosify_vit"]
    _stub_packages()
    _stub_torchvision()
    mods = sys.modules["bcos.modules"]
    if not hasattr(mods, "LogitLayer"):
        mods.LogitLayer = load_reference("bcos.modules.logitlayer").LogitLayer
    # `from bcos.modules import norms` + norms.DetachableLayerNorm /
    # norms.DetachableGroupNorm2d (bcosify_vit.py:146-151)
    norms_stub = sys.modules["bcos.modules.norms"]
    if not hasattr(norms_stub, "DetachableLayerNorm"):
        centered = load_reference("bcos.modules.norms.centered_norms")
        norms_stub.DetachableLayerNorm = centered.DetachableLayerNorm
        norms_stub.DetachableGroupNorm2d = centered.DetachableGroupNorm2d
    mods.norms = norms_stub
    spec = importlib.util.spec_from_file_location(
        "bcosify_vit", REFERENCE / "bcosify_vit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bcosify_vit"] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_captum():
    """Minimal `captum.attr` so the reference's captum-gated explainer module
    (`interpretability/explanation_methods/explainers/captum.py`) imports and
    the "Ours" path (`bcos/common.py:311` -> IxG) runs. Only InputXGradient
    is functional — captum semantics: attribution = input * d(output[:,
    target])/d(input); the other five names are import-time placeholders.
    The reference's CaptumDerivative hard-calls `.cuda()` (GPU-only
    upstream); on CUDA-less hosts Tensor.cuda is made a no-op."""
    if "captum" in sys.modules:
        return
    import torch

    class InputXGradient:
        def __init__(self, forward_func):
            self.forward_func = forward_func

        def attribute(self, inputs, target=None, **kwargs):
            with torch.enable_grad():
                inp = inputs.clone().detach().requires_grad_(True)
                out = self.forward_func(inp)
                t = torch.as_tensor(target).reshape(-1)
                if t.numel() == 1:
                    t = t.expand(out.shape[0])
                sel = out.gather(1, t.view(-1, 1)).sum()
                grad = torch.autograd.grad(sel, inp)[0]
            return grad * inp

    class _Unused:
        def __init__(self, *a, **k):
            raise NotImplementedError("captum stub: only InputXGradient works")

    captum = types.ModuleType("captum")
    attr = types.ModuleType("captum.attr")
    attr.InputXGradient = InputXGradient
    for nm in ("DeepLift", "GuidedBackprop", "IntegratedGradients",
               "LayerGradCam", "Saliency"):
        setattr(attr, nm, type(nm, (_Unused,), {}))
    captum.attr = attr
    sys.modules["captum"] = captum
    sys.modules["captum.attr"] = attr

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self


def load_reference_localisation():
    """Import the reference's `interpretability.analyses.localisation`
    (LocalisationAnalyser — the grid pointing game,
    `/root/reference/interpretability/analyses/localisation.py`) with its
    package chain satisfied from the reference tree. `bcos.experiments.utils`
    is stubbed with `Experiment = object` (localisation only imports the name
    for typing); captum is absent here, so the captum-gated "Ours" entry
    (which itself needs no captum — it just returns the model,
    `explainers/ours.py:9-14`) is registered into the explainer map."""
    name = "interpretability.analyses.localisation"
    if name in sys.modules:
        return sys.modules[name]
    _stub_packages()
    _stub_captum()
    import matplotlib

    matplotlib.use("Agg")
    for pkg, path in [
        ("interpretability", REFERENCE / "interpretability"),
        ("interpretability.analyses", REFERENCE / "interpretability" / "analyses"),
        (
            "interpretability.explanation_methods",
            REFERENCE / "interpretability" / "explanation_methods",
        ),
    ]:
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [str(path)]
            sys.modules[pkg] = mod
    # the explainers package defines get_explainer/explainer_map in its
    # __init__.py — execute the real file (a bare path stub has no attrs)
    expl_name = "interpretability.explanation_methods.explainers"
    if expl_name not in sys.modules:
        expl_dir = REFERENCE / "interpretability" / "explanation_methods" / "explainers"
        spec = importlib.util.spec_from_file_location(
            expl_name,
            expl_dir / "__init__.py",
            submodule_search_locations=[str(expl_dir)],
        )
        expl = importlib.util.module_from_spec(spec)
        sys.modules[expl_name] = expl
        spec.loader.exec_module(expl)
    if "bcos.experiments" not in sys.modules:
        exp = types.ModuleType("bcos.experiments")
        exp.__path__ = [str(REFERENCE / "bcos" / "experiments")]
        sys.modules["bcos.experiments"] = exp
    if "bcos.experiments.utils" not in sys.modules:
        utils_stub = types.ModuleType("bcos.experiments.utils")
        utils_stub.Experiment = object
        sys.modules["bcos.experiments.utils"] = utils_stub
    mod = importlib.import_module(name)
    explainers = importlib.import_module(
        "interpretability.explanation_methods.explainers"
    )
    if "Ours" not in explainers.explainer_map:
        ours = importlib.import_module(
            "interpretability.explanation_methods.explainers.ours"
        )
        explainers.explainer_map["Ours"] = ours.Ours
    return mod


def load_reference_text_localisation():
    """Import the reference's `interpretability.analyses.text_localisation`
    (`/root/reference/interpretability/analyses/text_localisation.py`) for its
    `compute_attributions` oracle (:68-126). Module-level imports satisfied
    from the reference tree (`bcos.common`, `bcos.data.transforms`,
    `bcos.data.imagenet`) or stubs: `clip` is a bare placeholder (the oracle
    function never touches it — tokenize_text/get_clip_model do, and they are
    not under test), `bcos.experiments.utils.Experiment = object`, and the
    torchvision presets stub supplies transforms/functional/make_grid."""
    name = "interpretability.analyses.text_localisation"
    if name in sys.modules:
        return sys.modules[name]
    _stub_packages()
    _stub_torchvision_presets()
    import matplotlib

    matplotlib.use("Agg")
    if "clip" not in sys.modules:
        clip_stub = types.ModuleType("clip")

        def _unavailable(*a, **k):
            raise NotImplementedError(
                "clip stub: only compute_attributions is under test"
            )

        clip_stub.load = _unavailable
        clip_stub.tokenize = _unavailable
        sys.modules["clip"] = clip_stub
    for pkg, path in [
        ("interpretability", REFERENCE / "interpretability"),
        ("interpretability.analyses", REFERENCE / "interpretability" / "analyses"),
    ]:
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [str(path)]
            sys.modules[pkg] = mod
    if "bcos.experiments" not in sys.modules:
        exp = types.ModuleType("bcos.experiments")
        exp.__path__ = [str(REFERENCE / "bcos" / "experiments")]
        sys.modules["bcos.experiments"] = exp
    if "bcos.experiments.utils" not in sys.modules:
        utils_stub = types.ModuleType("bcos.experiments.utils")
        utils_stub.Experiment = object
        sys.modules["bcos.experiments.utils"] = utils_stub
    return importlib.import_module(name)


def load_reference_clip_benchmark_metric(stem: str):
    """Standalone import of the reference's
    `/root/reference/CLIP_benchmark/clip_benchmark/metrics/<stem>.py` under
    the alias ``ref_cb_<stem>`` (our vendored package owns the
    ``clip_benchmark`` name). The retrieval/classification/selection metric
    modules only import torch / tqdm / sklearn, all present here."""
    name = f"ref_cb_{stem}"
    if name in sys.modules:
        return sys.modules[name]
    metrics_dir = REFERENCE / "CLIP_benchmark" / "clip_benchmark" / "metrics"
    if stem == "linear_probe":
        # linear_probe does `from .zeroshot_classification import accuracy` —
        # give it a package context rooted at the reference metrics dir
        pkg_name = "ref_cb_metrics"
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [str(metrics_dir)]
            sys.modules[pkg_name] = pkg
        mod = importlib.import_module(f"{pkg_name}.{stem}")
        sys.modules[name] = mod
        return mod
    spec = importlib.util.spec_from_file_location(
        name, metrics_dir / f"{stem}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod

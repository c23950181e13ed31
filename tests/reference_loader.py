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

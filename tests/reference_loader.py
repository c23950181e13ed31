"""Load individual reference (PyTorch) source files for parity tests WITHOUT
importing the full `bcos` package (whose __init__ needs torchvision, which is
not installed here).

We register stub parent packages pointing at /root/reference so that only the
leaf modules we need (and their torch-only deps) get executed. Used purely as a
numerical oracle in tests — the framework itself never imports these.
"""
import importlib
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

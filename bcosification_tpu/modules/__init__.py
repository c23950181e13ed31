"""Module library (flax.linen) — parity with `/root/reference/bcos/modules/`."""
from bcosification_tpu.modules import norms
from bcosification_tpu.modules.activations import DetachableGELU, Identity, MyGELU, PlainGELU, ReLU
from bcosification_tpu.modules.bcos_layers import (
    BcosConv2d,
    BcosConv2dWithScale,
    BcosifyConv2d,
    BcosifyLinear,
    BcosLinear,
    LogitLayer,
    NormedConv2d,
    NormedLinear,
)
from bcosification_tpu.modules.containers import BcosSequential, call_with_flags
from bcosification_tpu.modules.moe import BcosMoE
from bcosification_tpu.modules.norms import *  # noqa: F401,F403
from bcosification_tpu.modules.stochastic_depth import StochasticDepth

__all__ = [
    "norms",
    "BcosConv2d",
    "BcosConv2dWithScale",
    "BcosLinear",
    "BcosifyConv2d",
    "BcosifyLinear",
    "NormedConv2d",
    "NormedLinear",
    "LogitLayer",
    "BcosMoE",
    "BcosSequential",
    "call_with_flags",
    "DetachableGELU",
    "MyGELU",
    "PlainGELU",
    "ReLU",
    "Identity",
    "StochasticDepth",
]

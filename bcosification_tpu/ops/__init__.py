from bcosification_tpu.ops import bcos
from bcosification_tpu.ops.bcos import (
    bcos_conv2d,
    bcos_conv2d_reference,
    bcos_linear,
    dynamic_scale,
    normed_conv2d,
    normed_conv_weight,
    normed_linear,
    normed_linear_weight,
    patch_norms,
    patch_norms_reference,
)

__all__ = [
    "bcos",
    "bcos_conv2d",
    "bcos_conv2d_reference",
    "bcos_linear",
    "dynamic_scale",
    "normed_conv2d",
    "normed_conv_weight",
    "normed_linear",
    "normed_linear_weight",
    "patch_norms",
    "patch_norms_reference",
]

from bcosification_tpu.explain.core import (
    attribute,
    attribute_selection,
    contribution_map,
    dynamic_linear_weights,
    explain,
    gradient_to_image,
    make_explain_fn,
    plot_contribution_map,
)

__all__ = [
    "attribute",
    "attribute_selection",
    "contribution_map",
    "dynamic_linear_weights",
    "explain",
    "gradient_to_image",
    "make_explain_fn",
    "plot_contribution_map",
]

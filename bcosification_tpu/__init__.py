"""bcosification_tpu — a TPU-native (JAX/XLA/Pallas/pjit) B-cosification
framework.

A from-scratch re-design of the capabilities of shrebox/B-cosification
(NeurIPS 2024, arXiv 2411.00715): converting pretrained DNNs into inherently
interpretable B-cos networks, fine-tuning them (ImageNet supervised or CLIP
knowledge distillation with a SigLIP loss), producing faithful input-space
explanations from the model's own dynamic-linear weights W(x), and evaluating
accuracy, zero-shot / linear-probe CLIP performance, and explanation quality.

Public surface mirrors `/root/reference/bcos/__init__.py`.
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml


def __getattr__(name):
    # lazy imports keep `import bcosification_tpu` light
    import importlib

    submodules = {
        "presets": "bcosification_tpu.data.presets",
        "transforms": "bcosification_tpu.data.transforms",
        "models": "bcosification_tpu.models",
        "pretrained": "bcosification_tpu.models.pretrained",
        "modules": "bcosification_tpu.modules",
        "optim": "bcosification_tpu.optim",
        "settings": "bcosification_tpu.settings",
        "losses": "bcosification_tpu.losses",
        "explain": "bcosification_tpu.explain",
        "clip": "bcosification_tpu.clip",
    }
    if name in submodules:
        return importlib.import_module(submodules[name])
    if name in ("BcosModel", "gradient_to_image", "plot_contribution_map"):
        from bcosification_tpu import common

        return getattr(common, name)
    raise AttributeError(name)

"""bcosification_tpu — a TPU-native (JAX/XLA/Pallas/pjit) B-cosification
framework.

A from-scratch re-design of the capabilities of shrebox/B-cosification
(NeurIPS 2024, arXiv 2411.00715): converting pretrained DNNs into inherently
interpretable B-cos networks, fine-tuning them (ImageNet supervised or CLIP
knowledge distillation with a SigLIP loss), producing faithful input-space
explanations from the model's own dynamic-linear weights W(x), and evaluating
accuracy, zero-shot / linear-probe CLIP performance, and explanation quality.

See SURVEY.md at the repo root for the reference layer map this build follows.
"""

__version__ = "0.1.0"

"""Interpretability analyses — parity with `/root/reference/interpretability/`."""
from bcosification_tpu.interpretability import analyses, explanation_methods

"""Convenience model wrapper — the `BcosUtilMixin` equivalent.

Parity target: `/root/reference/bcos/common.py:38-344`. Linen modules are
pure, so instead of a mixin the helpers live on a small wrapper bundling
(model, variables); `explanation_mode` is a call-time variant rather than a
context manager, but a compatibility context manager is provided for
API-familiar code.
"""
from __future__ import annotations

import contextlib
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from bcosification_tpu.explain.core import (
    attribute as _attribute,
    attribute_selection as _attribute_selection,
    explain as _explain,
    gradient_to_image,
    plot_contribution_map,
)

__all__ = ["BcosModel", "gradient_to_image", "plot_contribution_map"]


def to_probabilities(logits):
    """B-cos nets output BCE logits (common.py:73-74)."""
    return jax.nn.sigmoid(logits)


class BcosModel:
    """Bundle of (linen model, variables) with the BcosUtilMixin surface."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._explain_default = False

    # -- forward ---------------------------------------------------------------
    def __call__(self, x, *, train: bool = False, explain: Optional[bool] = None):
        explain = self._explain_default if explain is None else explain
        return self.model.apply(self.variables, x, train=train, explain=explain)

    to_probabilities = staticmethod(to_probabilities)

    # -- explanation mode (common.py:347-384) ----------------------------------
    @contextlib.contextmanager
    def explanation_mode(self):
        """Compatibility context manager: inside it, plain calls use the
        explanation-variant forward."""
        prev = self._explain_default
        self._explain_default = True
        try:
            yield self
        finally:
            self._explain_default = prev

    # -- helpers ----------------------------------------------------------------
    def explain(self, in_tensor, idx: Optional[int] = None, **kwargs) -> Dict[str, Any]:
        """common.py:92-188."""
        return _explain(self.model, self.variables, in_tensor, idx=idx, **kwargs)

    def _expl_apply(self, x):
        return self.model.apply(self.variables, x, train=False, explain=True)

    def attribute(self, image, target, **kwargs):
        """IxG with detached dynamic weights (common.py:280-317)."""
        return _attribute(self._expl_apply, image, target)

    def attribute_selection(self, image, targets: Sequence[int], **kwargs):
        """common.py:319-344."""
        return _attribute_selection(self._expl_apply, image, targets)

    gradient_to_image = staticmethod(gradient_to_image)
    plot_contribution_map = staticmethod(plot_contribution_map)

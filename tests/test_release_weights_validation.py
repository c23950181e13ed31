"""Gated real-released-weights validation (BASELINE.md accuracy north stars).

No released checkpoints ship with this repo (zero-egress pod); the moment
`.pth` files from the reference's URL table land in $BCOS_WEIGHTS_DIR, this
test validates each one with scripts/validate_release_weights.py's logit
parity (converted flax model vs the reference's own torch model loading the
SAME checkpoint, fixed input). Until then it is visible-but-skipped, so the
suite always advertises the harness.

Run the full validation (plus ImageNet top-1 when data exists) directly:

    BCOS_WEIGHTS_DIR=... python scripts/validate_release_weights.py
"""
import os
from pathlib import Path

import pytest

pytest.importorskip("torch")

from reference_loader import reference_available  # noqa: E402

WEIGHTS_DIR = os.getenv("BCOS_WEIGHTS_DIR")


def _cases():
    if not WEIGHTS_DIR:
        return [
            pytest.param(
                "<none>",
                marks=pytest.mark.skip(
                    reason="BCOS_WEIGHTS_DIR not set — no released weights on "
                    "this host"
                ),
            )
        ]
    from bcosification_tpu.models.pretrained import list_available

    found = [
        n for n in list_available() if (Path(WEIGHTS_DIR) / f"{n}.pth").exists()
    ]
    if not found:
        return [
            pytest.param(
                "<none>",
                marks=pytest.mark.skip(
                    reason=f"no released .pth checkpoints in {WEIGHTS_DIR}"
                ),
            )
        ]
    return found


@pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)
@pytest.mark.parametrize("name", _cases())
def test_released_checkpoint_logit_parity(name):
    from scripts.validate_release_weights import validate_logit_parity

    details = validate_logit_parity(name, Path(WEIGHTS_DIR))
    assert details["passed"], details
    assert details["pred_agree"], details

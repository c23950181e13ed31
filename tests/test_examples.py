"""The runnable examples stay runnable (subprocess smokes, slow-marked —
they compile an RN50 / an 8-device ViT on the CPU backend)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_explain_minimal(tmp_path):
    out = tmp_path / "expl.png"
    env = dict(os.environ, BCOS_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "explain_minimal.py"),
         str(out)],
        env=env, capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert out.exists() and out.stat().st_size > 1000
    assert "calibrated" in r.stdout and "prediction" in r.stdout


def test_scaling_demo(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "scaling_demo.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-800:]
    losses = [
        float(line.split(":")[1]) for line in r.stdout.splitlines()
        if line.split(":")[0].strip()
        in ("DP  loss", "FSDP loss", "TP  loss", "PP  loss")
    ]
    assert len(losses) == 4 and max(losses) - min(losses) < 1e-5, r.stdout

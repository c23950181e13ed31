"""CLIP-KD CLI drive: `train.py --dataset CC3M --base_network
clip_bcosification --fast_dev_run` as a subprocess over synthetic webdataset
shards — locks the KD entry path (CLIP teacher build, bcosified student,
SigLIP loss, wds pipeline) end-to-end.

A random-init bcosified RN50 outputs exactly 0 in eval mode (weights
contract), so KD smoke losses around ~10 are correct; NaN would mean a 0/0
normalisation regression (see .claude/skills/verify)."""
import io
import os
import subprocess
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parents[1]


@pytest.fixture(scope="module")
def fake_cc3m(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("fake_cc3m")
    rng = np.random.default_rng(0)

    def build_shard(path, n=70):
        with tarfile.open(path, "w") as tf:
            for i in range(n):
                key = f"{i:05d}"
                arr = (rng.random((64, 72, 3)) * 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                txt = f"a synthetic caption number {i}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(txt)
                tf.addfile(info, io.BytesIO(txt))

    (root / "training").mkdir()
    (root / "validation").mkdir()
    build_shard(root / "training" / "00000.tar")
    for i in range(1, 332):
        os.symlink("00000.tar", root / "training" / f"{i:05d}.tar")
    build_shard(root / "validation" / "00000.tar", n=70)
    os.symlink("00000.tar", root / "validation" / "00001.tar")
    return root


@pytest.mark.slow
def test_kd_train_cli(fake_cc3m, tmp_path):
    env = dict(os.environ)
    env.update(
        CC3M_PATH=str(fake_cc3m),
        BCOS_EXPERIMENT_ROOT=str(tmp_path / "exp"),
        JAX_PLATFORMS="cpu",
        # the axon sitecustomize overrides JAX_PLATFORMS; BCOS_PLATFORM is
        # applied via jax.config in the CLI mains and actually sticks
        BCOS_PLATFORM="cpu",
    )
    r = subprocess.run(
        [
            sys.executable, str(REPO / "train.py"),
            "--dataset", "CC3M", "--base_network", "clip_bcosification",
            "--experiment_name",
            "resnet_50_clip_b2_noBias_randomResizedCrop_sigLip_kd_CC3M_bcosification",
            "--fast_dev_run",
        ],
        env=env, cwd=str(REPO), capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, f"KD train.py failed:\n{r.stdout[-2500:]}\n{r.stderr[-2500:]}"
    assert "nan" not in r.stdout.lower().replace("nan]", ""), r.stdout[-800:]

"""CLIP zeroshot leg of the release-weights validation harness
(VERDICT r4 #3 — BASELINE.md's third accuracy contract).

Drives scripts/validate_release_weights.evaluate_clip_zeroshot END-TO-END on
synthetic assets: a tiny trained-style B-cos CLIP checkpoint produced by the
REFERENCE'S OWN conversion pipeline (the same calibrated builder the e2e
CLIP oracle uses), scored over synthetic wds/imagenet1k shards, with the
reference torch model evaluated on the same data + classifier. The
torch-vs-flax delta must satisfy the harness's 0.1% contract (here: exact
prediction agreement). Refs:
`/root/reference/CLIP_benchmark/clip_benchmark/cli.py:305-406`,
`metrics/zeroshot_classification.py:184`.
"""
import io
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("torch")
import torch  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from reference_loader import reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def clip_ckpt(tmp_path_factory):
    """A tiny trained-style B-cos CLIP visual checkpoint from the
    reference's own BcosifyNetwork pipeline (calibrated gammas so outputs
    are O(1) — the e2e oracle's fixture recipe)."""
    from test_e2e_clip_b2_oracle import _calibrated

    ref = _calibrated(False)  # pooled variant
    path = tmp_path_factory.mktemp("clip_weights") / "tiny_clip_student.pth"
    torch.save(ref.state_dict(), path)
    return path


@pytest.fixture(scope="module")
def wds_root(tmp_path_factory):
    """Synthetic wds/imagenet1k layout: one test shard of jpg+cls pairs,
    classnames.txt + zeroshot_classification_templates.txt."""
    from PIL import Image

    root = tmp_path_factory.mktemp("wds_imagenet1k")
    (root / "classnames.txt").write_text("goldfish\ttoaster\tjeep".replace("\t", "\n"))
    (root / "zeroshot_classification_templates.txt").write_text(
        "a photo of a {c}.\na picture of a {c}.\n"
    )
    split = root / "test"
    split.mkdir()
    rng = np.random.default_rng(0)
    with tarfile.open(split / "00000.tar", "w") as tf:
        for i in range(18):
            img = Image.fromarray(
                (rng.random((32, 32, 3)) * 255).astype(np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cls = str(i % 3).encode()
            info = tarfile.TarInfo(f"{i:06d}.cls")
            info.size = len(cls)
            tf.addfile(info, io.BytesIO(cls))
    return root


def test_infer_config_from_checkpoint(clip_ckpt):
    from bcosification_tpu.bcosify.clip_import import infer_clip_student_config
    from bcosification_tpu.bcosify.release_import import load_torch_state_dict

    cfg = infer_clip_student_config(load_torch_state_dict(clip_ckpt))
    assert cfg["vision_layers"] == (1, 1, 1, 1)
    assert cfg["vision_width"] == 16
    assert cfg["embed_dim"] == 32
    assert cfg["attn_unpool"] is False
    assert cfg["use_bias"] is False


def test_zeroshot_leg_end_to_end(clip_ckpt, wds_root, monkeypatch):
    """The full leg: convert -> clip_benchmark zeroshot metric over wds
    shards -> reference torch model on the same data -> delta contract."""
    # no CLIP text weights on this host: random-init tower is flagged, the
    # torch-vs-flax delta is still exact (same classifier both sides)
    for var in ("CLIP_WEIGHTS_PATH", "CLIP_WEIGHTS_DIR"):
        monkeypatch.delenv(var, raising=False)
    import warnings

    from scripts.validate_release_weights import evaluate_clip_zeroshot

    # the tiny reference model was calibrated at RES=64; the harness scores
    # at the 224 eval transform, which the tiny tower also accepts
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = evaluate_clip_zeroshot(
            clip_ckpt, wds_root, batch_size=6, with_reference=True
        )
    assert out["n"] == 18
    assert 0.0 <= out["zeroshot_acc1"] <= 1.0
    assert "RANDOM-INIT" in out["text_tower"]
    assert "reference_acc1" in out, out.get("reference_error")
    assert out["zeroshot_within_0p1"], out
    assert abs(out["delta_vs_reference"]) <= 1e-3, out

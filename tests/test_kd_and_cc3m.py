"""SigLIP KD train-step smoke test (tiny CLIP teacher + bcosified student)
and CC3M webdataset pipeline tests."""
import io
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.data.cc3m import WdsPipeline, expand_shard_pattern, iter_tar_samples


def test_expand_shard_pattern():
    assert expand_shard_pattern("/x/{00000..00002}.tar") == [
        "/x/00000.tar",
        "/x/00001.tar",
        "/x/00002.tar",
    ]
    assert expand_shard_pattern("/x/plain.tar") == ["/x/plain.tar"]


@pytest.fixture
def cc3m_shard(tmp_path, rng):
    from PIL import Image

    shard = tmp_path / "00000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(6):
            key = f"{i:05d}"
            arr = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"a photo of thing {i}".encode()
            info = tarfile.TarInfo(f"{key}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))
    return str(shard)


def test_iter_tar_samples(cc3m_shard):
    samples = list(iter_tar_samples(cc3m_shard))
    assert len(samples) == 6
    assert all("jpg" in s and "txt" in s and "__key__" in s for s in samples)


def test_wds_pipeline_pair_mode(cc3m_shard):
    from bcosification_tpu.clip.tokenizer import tokenize
    from bcosification_tpu.data import transforms as T

    pipe = WdsPipeline(
        [cc3m_shard],
        batch_size=2,
        mode="pair",
        transform=T.Compose([T.Resize(16), T.CenterCrop(16), T.ToFloatArray()]),
        tokenizer=tokenize,
    )
    batches = list(pipe)
    assert len(batches) == 3  # 6 samples / batch 2, partial dropped
    b = batches[0]
    assert b["image"].shape == (2, 16, 16, 3)
    assert b["text"].shape == (2, 77)
    assert len(b["key"]) == 2


def test_kd_train_step_tiny(rng):
    """One SigLIP KD step: loss finite, student params move, teacher frozen."""
    from bcosification_tpu.bcosify.clip_import import (
        build_bcosified_clip_visual,
        build_clip_teacher_visual,
    )
    from bcosification_tpu.optim import OptimizerFactory
    from bcosification_tpu.training import kd as kd_lib
    from bcosification_tpu.training import steps as steps_lib

    tiny = dict(
        embed_dim=16, image_resolution=32, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, context_length=8,
        vocab_size=64, transformer_width=16, transformer_heads=2,
        transformer_layers=1,
    )
    teacher, tvars = build_clip_teacher_visual(None, tiny)
    mc = {"bcosify_args": {"clip_kd": True, "use_bias": False}, "bcos_args": {"b": 2}}
    student, svars = build_bcosified_clip_visual(mc, None, tiny)

    tx = OptimizerFactory(name="Adam", lr=1e-3).create(1e-3)
    step = kd_lib.make_kd_train_step(
        student, teacher, tvars, tx, use_agc=True, donate=False
    )
    state = steps_lib.create_train_state(svars, tx)
    images = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
    p0 = jax.device_get(state.params)
    state, metrics = step(state, {"image": images})
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, jax.device_get(state.params)
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0

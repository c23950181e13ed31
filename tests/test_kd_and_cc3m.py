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


def test_wds_pipeline_repeat_streams_forever(cc3m_shard):
    """repeat=True (multi-host split shards): the stream loops with
    per-pass reshuffles so every host can serve a common steps_per_epoch
    even with unequal shard counts (r5 review: unequal per-host epoch
    lengths desync the collective train step)."""
    from bcosification_tpu.data import transforms as T

    pipe = WdsPipeline(
        [cc3m_shard],
        batch_size=2,
        mode="image",
        transform=T.Compose([T.Resize(16), T.CenterCrop(16), T.ToFloatArray()]),
        shuffle_buffer=4,
        repeat=True,
    )
    it = iter(pipe)
    keys = []
    for _ in range(8):  # one pass is 3 batches; 8 spans 3 passes
        keys.append(tuple(next(it)["key"]))
    # every sample keeps appearing (the stream loops) ...
    seen = [k for batch in keys for k in batch]
    assert set(seen) == {f"{i:05d}" for i in range(6)}
    assert len(seen) == 16
    # ... and later passes are reshuffled, not verbatim replays
    assert keys[0:3] != keys[3:6]
    # a non-repeat pipeline still terminates
    pipe.repeat = False
    assert len(list(pipe)) == 3


def test_cc3m_datamodule_threads_seed(cc3m_shard, tmp_path, monkeypatch):
    """train_dataloader(seed=...) must reach the pipeline: shard order,
    shuffle draws and native augmentations are all keyed on it (r5 review:
    the argument was silently dropped)."""
    from bcosification_tpu.data.cc3m import CC3MDataModule
    from bcosification_tpu.data import transforms as T

    import shutil

    root = tmp_path / "cc3m"
    (root / "training").mkdir(parents=True)
    (root / "validation").mkdir()
    shutil.copy(cc3m_shard, root / "training" / "00000.tar")
    shutil.copy(cc3m_shard, root / "validation" / "00000.tar")

    tr = T.Compose([T.Resize(16), T.CenterCrop(16), T.ToFloatArray()])
    dm = CC3MDataModule(
        {
            "data_root": str(root),
            "batch_size": 2,
            "train_transform": tr,
            "test_transform": tr,
        }
    )
    dm.TRAIN_SHARDS = "training/00000.tar"
    dm.VAL_SHARDS = "validation/00000.tar"
    dm.setup("fit")
    loader = dm.train_dataloader(seed=5)
    assert loader.seed == 5


def test_wds_pipeline_native_decode_matches_python(tmp_path):
    """With the real CLIP-KD eval preset, native_decode=True (strict) routes
    decoding through the native in-memory path (thread-pooled libjpeg) while
    'auto' keeps eval on PIL for parity — same keys/texts, images equal to
    the PIL path up to resampler differences."""
    import pytest as _pytest

    from bcosification_tpu.clip.tokenizer import tokenize
    from bcosification_tpu.data import native_loader
    from bcosification_tpu.data.presets import (
        CLIPBcosImageNetClassificationPresetEval,
    )

    if not native_loader.native_available():
        _pytest.skip("native loader not built")
    preset = CLIPBcosImageNetClassificationPresetEval(crop_size=16, resize_size=20)

    # smooth images: PIL's antialiased bilinear and the native point-sampled
    # bilinear only agree structurally on band-limited content (random-noise
    # pixels decorrelate under any two different downsamplers)
    import io as _io
    import tarfile as _tarfile

    from PIL import Image as _Image

    shard = str(tmp_path / "smooth.tar")
    yy, xx = np.mgrid[0:32, 0:40].astype(np.float32)
    with _tarfile.open(shard, "w") as tf:
        for i in range(6):
            arr = np.stack(
                [
                    127 + 120 * np.sin(xx / (3 + i) + yy / 5),
                    255 * xx / 40,
                    255 * yy / 32,
                ],
                axis=-1,
            ).clip(0, 255).astype(np.uint8)
            buf = _io.BytesIO()
            _Image.fromarray(arr).save(buf, format="JPEG", quality=95)
            data = buf.getvalue()
            info = _tarfile.TarInfo(f"{i:05d}.jpg")
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
            txt = f"a photo of thing {i}".encode()
            info = _tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(txt)
            tf.addfile(info, _io.BytesIO(txt))

    def run(native):
        pipe = WdsPipeline(
            [shard], batch_size=2, mode="pair", transform=preset,
            tokenizer=tokenize, native_decode=native,
        )
        assert (pipe._native_plan() is not None) == (native is True)
        return list(pipe)

    a = run(True)
    b = run(False)
    assert len(a) == len(b) == 3
    for ba, bb in zip(a, b):
        assert ba["key"] == bb["key"]
        np.testing.assert_array_equal(ba["text"], bb["text"])
        assert ba["image"].shape == bb["image"].shape == (2, 16, 16, 3)
        # PIL bilinear antialiases on downsample, the native resampler does
        # not — distribution-level agreement like tests/test_native_loader.py
        assert abs(float(ba["image"].mean()) - float(bb["image"].mean())) < 0.02
        corr = np.corrcoef(ba["image"].ravel(), bb["image"].ravel())[0, 1]
        assert corr > 0.95, corr


def test_wds_pipeline_native_train_deterministic(cc3m_shard):
    """Train-mode native decode (RRC + flip) is reproducible per pipeline
    seed and produces valid [0,1] 3-channel crops."""
    import pytest as _pytest

    from bcosification_tpu.data import native_loader
    from bcosification_tpu.data.presets import (
        CLIPBcosImageNetClassificationPresetTrain,
    )

    if not native_loader.native_available():
        _pytest.skip("native loader not built")
    preset = CLIPBcosImageNetClassificationPresetTrain(crop_size=16)

    def run(seed, epoch=0):
        pipe = WdsPipeline(
            [cc3m_shard], batch_size=2, mode="image", transform=preset,
            seed=seed, native_decode=True,
        )
        pipe.set_epoch(epoch)
        return np.concatenate([b["image"] for b in pipe])

    x1, x2, x3 = run(0), run(0), run(1)
    np.testing.assert_array_equal(x1, x2)
    assert float(np.abs(x1 - x3).max()) > 0  # different seed, different crops
    assert x1.shape == (6, 16, 16, 3)
    assert 0.0 <= x1.min() and x1.max() <= 1.0
    # epochs must not repeat augmentation draws (the fit loops call
    # set_epoch; a fixed per-sample seed would train on identical crops
    # every epoch) — and each epoch stays reproducible
    e1a, e1b = run(0, epoch=1), run(0, epoch=1)
    np.testing.assert_array_equal(e1a, e1b)
    assert float(np.abs(x1 - e1a).max()) > 0


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


def test_kd_train_step_attn_unpool(rng):
    """KD with an attn_unpool student (per-location features [B, HW, D]):
    the step must transpose into SigLipLoss's location-first (HW, B, D)
    convention (r5 review: untransposed features crashed whenever HW != B,
    or silently pooled the batch axis when HW == B)."""
    from bcosification_tpu.bcosify.clip_import import (
        build_bcosified_clip_visual,
        build_clip_teacher_visual,
    )
    from bcosification_tpu.losses import SigLipLoss
    from bcosification_tpu.optim import OptimizerFactory
    from bcosification_tpu.training import kd as kd_lib
    from bcosification_tpu.training import steps as steps_lib

    tiny = dict(
        embed_dim=16, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, context_length=8,
        vocab_size=64, transformer_width=16, transformer_heads=2,
        transformer_layers=1,
    )
    teacher, tvars = build_clip_teacher_visual(None, tiny)
    mc = {
        "bcosify_args": {"clip_kd": True, "use_bias": False},
        "bcos_args": {"b": 2},
        "attn_unpool": True,
        "cos_power": 2,
    }
    student, svars = build_bcosified_clip_visual(mc, None, tiny)

    # B=2, 64px -> 2x2 grid: HW=4 != B, the shape-error regression case
    images = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    s_out = student.apply(svars, jnp.concatenate([images, 1 - images], -1),
                          train=False)
    assert s_out.ndim == 3 and s_out.shape[:2] == (2, 4), s_out.shape

    tx = OptimizerFactory(name="Adam", lr=1e-3).create(1e-3)
    step = kd_lib.make_kd_train_step(
        student, teacher, tvars, tx, cos_power=2, use_agc=False, donate=False
    )
    state = steps_lib.create_train_state(svars, tx)
    state, metrics = step(state, {"image": images})
    assert np.isfinite(float(metrics["loss"]))

    # the step's loss IS the location-first SigLip on (teacher, student):
    # recompute with the same train-mode forward the loss_fn uses
    t_feat = teacher.apply(tvars, images, train=False)
    s_train, _ = student.apply(
        svars, jnp.concatenate([images, 1 - images], -1),
        train=True, mutable=["batch_stats"],
    )
    s = s_train / jnp.linalg.norm(s_train, axis=-1, keepdims=True)
    t = t_feat / jnp.linalg.norm(t_feat, axis=-1, keepdims=True)
    want = SigLipLoss()(jnp.swapaxes(s, 0, 1), t, 10.0, -10.0, cos_scaling=2)
    # jitted-step vs eager recompute differ only by fusion-level fp32
    # rounding (measured ~4e-4 rel)
    np.testing.assert_allclose(float(metrics["loss"]), float(want), rtol=2e-3)


def test_wds_native_png_fallback_seeded(tmp_path):
    """Non-JPEG members (libjpeg rejects) fall back to PIL with the SAME
    per-sample seed — the pipeline stays reproducible on mixed shards."""
    import io as _io
    import tarfile as _tarfile

    import pytest as _pytest

    from PIL import Image as _Image

    from bcosification_tpu.data import native_loader
    from bcosification_tpu.data.cc3m import WdsPipeline
    from bcosification_tpu.data.presets import (
        CLIPBcosImageNetClassificationPresetTrain,
    )

    if not native_loader.native_available():
        _pytest.skip("native loader not built")
    rng = np.random.default_rng(0)
    shard = str(tmp_path / "mixed.tar")
    with _tarfile.open(shard, "w") as tf:
        for i, fmt in enumerate(["JPEG", "PNG", "JPEG", "PNG"]):
            arr = (rng.random((24, 28, 3)) * 255).astype(np.uint8)
            buf = _io.BytesIO()
            _Image.fromarray(arr).save(buf, format=fmt)
            data = buf.getvalue()
            info = _tarfile.TarInfo(f"{i:05d}.{'jpg' if fmt == 'JPEG' else 'png'}")
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))

    def run(seed):
        pipe = WdsPipeline(
            [shard], batch_size=2, mode="image",
            transform=CLIPBcosImageNetClassificationPresetTrain(crop_size=16),
            seed=seed, native_decode=True, drop_partial=False,
        )
        return np.concatenate([b["image"] for b in pipe])

    x1, x2, x3 = run(0), run(0), run(5)
    assert x1.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(x1, x2)  # PNG members too
    assert float(np.abs(x1 - x3).max()) > 0

"""CLIP tower parity vs the vendored OpenAI fork (values on a tiny random
model imported through the real state_dict path)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_loader import REFERENCE, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

TINY = dict(
    embed_dim=16,
    image_resolution=64,
    vision_layers=(1, 1, 1, 1),
    vision_width=8,
    vision_patch_size=None,
    context_length=16,
    vocab_size=64,
    transformer_width=16,
    transformer_heads=2,
    transformer_layers=2,
)


def _torch_clip():
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_clip_model", REFERENCE / "CLIP" / "clip" / "model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    model = mod.CLIP(
        TINY["embed_dim"],
        TINY["image_resolution"],
        list(TINY["vision_layers"]),
        TINY["vision_width"],
        TINY["vision_patch_size"],
        TINY["context_length"],
        TINY["vocab_size"],
        TINY["transformer_width"],
        TINY["transformer_heads"],
        TINY["transformer_layers"],
    )
    return model.float().eval()


@needs_reference
def test_clip_towers_parity(rng):
    import torch

    tmodel = _torch_clip()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from bcosification_tpu.bcosify.clip_import import (
        build_clip_teacher_visual,
        build_clip_text,
    )
    from bcosification_tpu.clip.model import config_from_state_dict

    cfg = config_from_state_dict(sd)
    assert cfg["vision_layers"] == (1, 1, 1, 1)
    assert cfg["image_resolution"] == TINY["image_resolution"]
    # width//64 head sniffing (CLIP/clip/model.py:422) degenerates on tiny dims
    cfg["transformer_heads"] = TINY["transformer_heads"]

    visual, vv = build_clip_teacher_visual(sd, cfg)
    text, tv = build_clip_text(sd, cfg)

    x = rng.random((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_img = tmodel.visual(torch.from_numpy(x)).numpy()
    got_img = np.asarray(visual.apply(vv, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_img, want_img, rtol=1e-2, atol=2e-3)

    tokens = rng.integers(1, 60, (3, 16)).astype(np.int64)
    tokens[:, -1] = 63  # highest id = eot position marker
    with torch.no_grad():
        want_txt = tmodel.encode_text(torch.from_numpy(tokens)).numpy()
    got_txt = np.asarray(text.apply(tv, jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(got_txt, want_txt, rtol=1e-2, atol=2e-3)


@needs_reference
def test_bcosified_clip_student_b1_exact(rng):
    """b=1 + biases kept: the bcosified CLIP visual at init reproduces the
    pretrained visual on CLIP-normalised input (the CLIP analogue of the
    ResNet conversion oracle)."""
    import torch

    tmodel = _torch_clip()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from bcosification_tpu.bcosify.clip_import import build_bcosified_clip_visual
    from bcosification_tpu.clip.model import config_from_state_dict
    from bcosification_tpu.data.presets import CLIP_MEAN, CLIP_STD

    cfg = config_from_state_dict(sd)
    cfg["transformer_heads"] = TINY["transformer_heads"]
    mc = {
        "bcosify_args": {"clip_kd": True, "use_bias": True},
        "bcos_args": {"b": 1},
    }
    student, svars = build_bcosified_clip_visual(mc, sd, cfg)

    x = rng.random((2, 64, 64, 3)).astype(np.float32)  # raw [0,1]
    x6 = np.concatenate([x, 1.0 - x], axis=-1)
    got = np.asarray(student.apply(svars, jnp.asarray(x6)))

    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    xt = (torch.from_numpy(x.transpose(0, 3, 1, 2)) - mean) / std
    with torch.no_grad():
        # the bcosified attnpool drops the positional embedding AND runs all
        # pooled projections weight-only (the reference's pooled forward
        # passes in_proj_bias=None / out_proj_bias=None into
        # F.multi_head_attention_forward, bcosattnpool.py:40-59) — zero both
        # on the torch side so the trunk exactness oracle stays meaningful
        ap = tmodel.visual.attnpool
        ap.positional_embedding.data.zero_()
        for lin in (ap.q_proj, ap.k_proj, ap.v_proj, ap.c_proj):
            if lin.bias is not None:
                lin.bias.data.zero_()
        want = tmodel.visual(xt).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-3)


@needs_reference
def test_load_state_dict_file_torchscript_roundtrip(rng, tmp_path, monkeypatch):
    """The checkpoint-FILE import seam (clip/load.py::load_state_dict_file):
    a real torchscript archive (fp16, like OpenAI's published .pt files) must
    load into the same arrays as the in-memory state_dict path and build an
    equivalent visual tower. Ref: CLIP/clip/clip.py:94, model.py:400-438."""
    import torch

    from bcosification_tpu.clip.load import load_state_dict_file

    tmodel = _torch_clip()
    sd_mem = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    img = torch.randn(1, 3, 64, 64)
    toks = torch.randint(1, 60, (1, 16))
    with torch.no_grad():
        traced = torch.jit.trace(tmodel, (img, toks), strict=False)
    traced = traced.half()  # OpenAI ships fp16 archives
    archive = tmp_path / "RN50.pt"
    traced.save(str(archive))

    monkeypatch.setenv("CLIP_WEIGHTS_PATH", str(archive))
    monkeypatch.delenv("CLIP_WEIGHTS_DIR", raising=False)
    sd_file = load_state_dict_file("RN50")

    float_keys = {k for k, v in sd_mem.items() if v.dtype == np.float32}
    assert float_keys <= set(sd_file), sorted(float_keys - set(sd_file))[:5]
    for k in sorted(float_keys):
        assert sd_file[k].dtype == np.float32  # fp16 -> fp32 (.float())
        np.testing.assert_allclose(
            sd_file[k], sd_mem[k], rtol=2e-3, atol=2e-3, err_msg=k
        )

    # the file-loaded dict must drive the same build path as the in-memory one
    from bcosification_tpu.bcosify.clip_import import build_clip_teacher_visual
    from bcosification_tpu.clip.model import config_from_state_dict

    cfg = config_from_state_dict(sd_file)
    assert cfg["vision_layers"] == TINY["vision_layers"]
    visual, vv = build_clip_teacher_visual(sd_file, cfg)
    visual2, vv2 = build_clip_teacher_visual(sd_mem, cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    got = np.asarray(visual.apply(vv, x))
    want = np.asarray(visual2.apply(vv2, x))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_load_state_dict_file_npz_and_dir_resolution(tmp_path, monkeypatch):
    """CLIP_WEIGHTS_DIR/<name>.npz resolution branch."""
    from bcosification_tpu.clip.load import load_state_dict_file

    np.savez(tmp_path / "ViT-B-32.npz", **{"visual.proj": np.ones((4, 2), np.float32)})
    monkeypatch.delenv("CLIP_WEIGHTS_PATH", raising=False)
    monkeypatch.setenv("CLIP_WEIGHTS_DIR", str(tmp_path))
    sd = load_state_dict_file("ViT-B/32")
    np.testing.assert_array_equal(sd["visual.proj"], np.ones((4, 2), np.float32))

    with pytest.warns(UserWarning, match="random init"):
        assert load_state_dict_file("RN50x64") is None

"""CLIP ViT tower bcosification (beyond-reference: the reference only
bcosifies CLIP-RN50). Teacher import, the exact b=1 conversion oracle, and
explain-mode dynamic-linear weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.bcosify.clip_import import (
    build_bcosified_clip_vit_visual,
    build_clip_teacher_visual,
)
from bcosification_tpu.clip import model as clip_model
from bcosification_tpu.models.bcosify_net import normalization_for


@pytest.fixture(scope="module")
def tiny_vit_sd():
    """Synthetic CLIP-ViT checkpoint in the torch key layout."""
    rng = np.random.default_rng(0)
    W, L, P, R, E = 64, 2, 8, 32, 16
    sd = {}
    sd["visual.conv1.weight"] = (
        rng.standard_normal((W, 3, P, P)).astype(np.float32) * 0.05
    )
    sd["visual.class_embedding"] = rng.standard_normal(W).astype(np.float32) * 0.02
    n_tok = (R // P) ** 2 + 1
    sd["visual.positional_embedding"] = (
        rng.standard_normal((n_tok, W)).astype(np.float32) * 0.02
    )
    sd["visual.proj"] = rng.standard_normal((W, E)).astype(np.float32) * 0.05
    for ln in ("visual.ln_pre", "visual.ln_post"):
        sd[f"{ln}.weight"] = np.ones(W, np.float32)
        sd[f"{ln}.bias"] = rng.standard_normal(W).astype(np.float32) * 0.01
    for i in range(L):
        tp = f"visual.transformer.resblocks.{i}"
        sd[f"{tp}.attn.in_proj_weight"] = (
            rng.standard_normal((3 * W, W)).astype(np.float32) * 0.05
        )
        sd[f"{tp}.attn.in_proj_bias"] = (
            rng.standard_normal(3 * W).astype(np.float32) * 0.01
        )
        sd[f"{tp}.attn.out_proj.weight"] = (
            rng.standard_normal((W, W)).astype(np.float32) * 0.05
        )
        sd[f"{tp}.attn.out_proj.bias"] = (
            rng.standard_normal(W).astype(np.float32) * 0.01
        )
        for lnk in ("ln_1", "ln_2"):
            sd[f"{tp}.{lnk}.weight"] = np.ones(W, np.float32)
            sd[f"{tp}.{lnk}.bias"] = (
                rng.standard_normal(W).astype(np.float32) * 0.01
            )
        sd[f"{tp}.mlp.c_fc.weight"] = (
            rng.standard_normal((4 * W, W)).astype(np.float32) * 0.05
        )
        sd[f"{tp}.mlp.c_fc.bias"] = (
            rng.standard_normal(4 * W).astype(np.float32) * 0.01
        )
        sd[f"{tp}.mlp.c_proj.weight"] = (
            rng.standard_normal((W, 4 * W)).astype(np.float32) * 0.05
        )
        sd[f"{tp}.mlp.c_proj.bias"] = (
            rng.standard_normal(W).astype(np.float32) * 0.01
        )
    sd["text_projection"] = np.zeros((32, E), np.float32)
    sd["positional_embedding"] = np.zeros((77, 32), np.float32)
    sd["token_embedding.weight"] = np.zeros((100, 32), np.float32)
    sd["ln_final.weight"] = np.ones(32, np.float32)
    return sd


def test_vit_config_sniffing(tiny_vit_sd):
    cfg = clip_model.config_from_state_dict(tiny_vit_sd)
    assert cfg["vision_layers"] == 2 and cfg["vision_patch_size"] == 8
    assert cfg["image_resolution"] == 32 and cfg["embed_dim"] == 16


def test_vit_teacher_import_runs(tiny_vit_sd, rng):
    cfg = clip_model.config_from_state_dict(tiny_vit_sd)
    teacher, tvars = build_clip_teacher_visual(tiny_vit_sd, cfg)
    out = teacher.apply(tvars, jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32)))
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_b1_conversion_oracle(tiny_vit_sd, rng):
    """b=1 + kept biases must reproduce the pretrained tower EXACTLY on the
    BcosifyNetwork's normalized [z, -z] 6-channel encoding (the same
    invariant as the CNN/CLIP-RN50 oracles)."""
    cfg = clip_model.config_from_state_dict(tiny_vit_sd)
    teacher, tvars = build_clip_teacher_visual(tiny_vit_sd, cfg)
    mc = {"bcosify_args": {"use_bias": True}, "bcos_args": {"b": 1}}
    student, svars = build_bcosified_clip_vit_visual(mc, tiny_vit_sd, cfg)

    mean, std = normalization_for(clip_kd=True, bfy_mean_zero=False)
    raw = rng.random((2, 32, 32, 3)).astype(np.float32)
    x6 = jnp.asarray(np.concatenate([raw, 1.0 - raw], axis=-1))
    z = (raw - np.asarray(mean)[:3]) / np.asarray(std)[:3]

    t_out = np.asarray(teacher.apply(tvars, jnp.asarray(z)))
    s_out = np.asarray(student.apply(svars, x6, train=False))
    np.testing.assert_allclose(s_out, t_out, atol=2e-6)


def test_vit_student_explain_linear(tiny_vit_sd, rng):
    """b=2 bias-free student: explain-mode W(x) exists, is finite, and the
    explain forward equals the normal forward (values identical, gradients
    differ — the framework invariant)."""
    cfg = clip_model.config_from_state_dict(tiny_vit_sd)
    mc = {"bcosify_args": {"use_bias": False}, "bcos_args": {"b": 2}}
    student, svars = build_bcosified_clip_vit_visual(mc, tiny_vit_sd, cfg)
    x6 = jnp.asarray(rng.random((1, 32, 32, 6)).astype(np.float32))

    o1 = student.apply(svars, x6, train=False, explain=True)
    o2 = student.apply(svars, x6, train=False, explain=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=0)

    f = lambda t: (student.apply(svars, t, train=False, explain=True) ** 2).sum()
    w = jax.grad(f)(x6)
    assert w.shape == x6.shape and np.isfinite(np.asarray(w)).all()


def test_vit_experiment_config(rng):
    """The beyond-reference ViT KD configs resolve through the Experiment
    surface and build runnable students (random init when weights absent)."""
    from bcosification_tpu.experiments.utils import Experiment

    exp = Experiment(
        "ImageNet", "clip_bcosification",
        "vit_b_32_clip_b2_noBias_randomResizedCrop_sigLip_ImageNet_bcosification",
    )
    net, variables = exp.get_model()
    out = net.apply(variables, jnp.zeros((1, 224, 224, 6), jnp.float32), train=False)
    assert out.shape == (1, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_unpool_tokens(tiny_vit_sd, rng):
    """attn_unpool analogue for ViT: per-token L2-normalised features
    [B, HW, D] (text-localisation basis)."""
    cfg = clip_model.config_from_state_dict(tiny_vit_sd)
    mc = {
        "bcosify_args": {"use_bias": False},
        "bcos_args": {"b": 2},
        "attn_unpool": True,
    }
    student, svars = build_bcosified_clip_vit_visual(mc, tiny_vit_sd, cfg)
    x6 = jnp.asarray(rng.random((2, 32, 32, 6)).astype(np.float32))
    out = np.asarray(student.apply(svars, x6, train=False))
    assert out.shape == (2, 16, 16)  # [B, HW=4x4 patches, D=embed 16]
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)

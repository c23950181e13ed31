"""Text2Concept aligner: closed-form fit, persistence, reference
differential, and the model-type wiring.

Parity target: `/root/reference/CLIP_benchmark/clip_benchmark/models/
Text2Concept/TextToConcept.py` (LinearAligner.train :19-50, save_W/load_W
:52-75, LinearRegressionSolver :88-155) and `models/text2concept_clip.py:43`
(the loader consumes a pretrained aligner file). Our aligner solves the same
regression in closed form (ridge least squares); the differential test here
locks the agreement against a faithful torch reimplementation of the
reference's SGD recipe on a well-conditioned synthetic problem.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_benchmark.models.text2concept import TextToConcept, fit_linear_aligner


def _synth_problem(rng, n=600, d_in=8, d_out=5, noise=0.01, bias=True):
    F = rng.standard_normal((n, d_in)).astype(np.float32)
    W_true = rng.standard_normal((d_in, d_out)).astype(np.float32)
    b_true = rng.standard_normal(d_out).astype(np.float32) if bias else 0.0
    G = F @ W_true + b_true + noise * rng.standard_normal((n, d_out)).astype(np.float32)
    return F, G, W_true, b_true


def test_fit_recovers_true_map():
    rng = np.random.default_rng(0)
    F, G, W_true, b_true = _synth_problem(rng, noise=0.0, bias=False)
    W, b = fit_linear_aligner(F, G, ridge=1e-6, bias=False)
    assert b is None
    np.testing.assert_allclose(W, W_true, atol=1e-3)

    F, G, W_true, b_true = _synth_problem(rng, noise=0.0, bias=True)
    W, b = fit_linear_aligner(F, G, ridge=1e-6, bias=True)
    np.testing.assert_allclose(W, W_true, atol=1e-3)
    np.testing.assert_allclose(b, b_true, atol=1e-3)


def _reference_linear_aligner(F, G, epochs, target_variance=4.5, seed=0):
    """Faithful reimplementation of the reference's `LinearAligner.train`
    (TextToConcept.py:19-50) + `LinearRegressionSolver.train` (:92-137):
    scalar variance pre-scaling to target_variance, torch SGD
    (lr .01, momentum .9, weight_decay 5e-4) over shuffled batches of 100
    with CosineAnnealingLR(T_max=200), then W,b rescaled by c1/c2. ``epochs``
    is the one knob we raise above the reference's default 6 so its SGD
    actually converges on the fixture — the differential isolates the
    SOLVER SEMANTICS, not the reference's training budget."""
    import torch

    def get_variance(y):  # ref :148-151 — scalar over all entries
        return float(np.mean(np.square(y)) - np.mean(y) ** 2)

    c1 = (target_variance / get_variance(F)) ** 0.5
    c2 = (target_variance / get_variance(G)) ** 0.5
    Fs = torch.from_numpy(c1 * F).float()
    Gs = torch.from_numpy(c2 * G).float()
    torch.manual_seed(seed)
    model = torch.nn.Linear(F.shape[1], G.shape[1], bias=True)
    opt = torch.optim.SGD(
        model.parameters(), lr=0.01, momentum=0.9, weight_decay=5e-4
    )
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=200)
    crit = torch.nn.MSELoss()
    gen = torch.Generator().manual_seed(seed)
    for _ in range(epochs):
        perm = torch.randperm(Fs.shape[0], generator=gen)
        for i in range(0, Fs.shape[0], 100):
            idx = perm[i : i + 100]
            opt.zero_grad()
            loss = crit(model(Fs[idx]), Gs[idx])
            loss.backward()
            opt.step()
        sched.step()
    # Unscaling (ref :45-47): W <- W * c1/c2 is the correct inverse of the
    # variance pre-scaling; for the BIAS the algebra gives b <- b / c2
    # (c2*G ≈ (c1*F)@Ws^T + bs  =>  G ≈ F@(Ws*c1/c2)^T + bs/c2), but the
    # reference multiplies its bias by c1/c2 too — a factor-c1 bias error in
    # the reference's own code, likely why its shipped B-cos aligner is the
    # noBias variant (text2concept_clip.py:43) and `self.b = None` is
    # toggled in comments (:49-50). We return BOTH so the differential can
    # lock W against the reference and b against the correct algebra.
    W = model.weight.detach().numpy() * (c1 / c2)  # (out, in), ref :45-47
    b_as_published = model.bias.detach().numpy() * (c1 / c2)  # ref's rescale
    b_correct = model.bias.detach().numpy() / c2
    return (
        W.T.astype(np.float32),
        b_as_published.astype(np.float32),
        b_correct.astype(np.float32),
    )


def test_differential_vs_reference_sgd_aligner():
    """On a well-conditioned problem the closed-form ridge solve and the
    reference's converged SGD land on the same aligner (VERDICT r4 #5).
    The weight matrices agree directly; the bias agrees with the
    correctly-unscaled SGD bias (the reference's c1/c2 bias rescale is a
    factor-c1 error in its own code — see _reference_linear_aligner)."""
    rng = np.random.default_rng(1)
    F, G, W_true, b_true = _synth_problem(rng, noise=0.02, bias=True)
    W_ref, b_published, b_ref = _reference_linear_aligner(F, G, epochs=120)
    W_ls, b_ls = fit_linear_aligner(F, G, ridge=1e-2, bias=True)
    np.testing.assert_allclose(W_ls, W_ref, atol=0.05)
    np.testing.assert_allclose(b_ls, b_ref, atol=0.05)
    # aligned representations agree (prediction-space is the product contract)
    pred_ref = F @ W_ref + b_ref
    pred_ls = F @ W_ls + b_ls
    rel = np.linalg.norm(pred_ls - pred_ref) / np.linalg.norm(pred_ref)
    assert rel < 0.02, rel
    # and the documented difference is real: the published rescale is off by
    # exactly c1 relative to the algebraically-correct bias
    assert not np.allclose(b_published, b_ref, atol=0.05)


def _bare_t2c(encode_features):
    """TextToConcept without the heavy CLIP-tower __init__ (unit scope)."""
    t2c = TextToConcept.__new__(TextToConcept)
    t2c.encode_features = encode_features
    t2c.W = None
    t2c.b = None
    return t2c


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    for bias in (False, True):
        t2c = _bare_t2c(lambda x: x)
        t2c.W = rng.standard_normal((6, 4)).astype(np.float32)
        t2c.b = rng.standard_normal(4).astype(np.float32) if bias else None
        path = t2c.save_aligner(tmp_path / f"aligner_{bias}.npz")
        t2c2 = _bare_t2c(lambda x: x).load_aligner(path)
        np.testing.assert_array_equal(t2c2.W, t2c.W)
        if bias:
            np.testing.assert_array_equal(t2c2.b, t2c.b)
        else:
            assert t2c2.b is None
        # encode_image applies W (+ b): spot value
        feats = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32))
        want = np.asarray(feats) @ t2c.W + (t2c.b if bias else 0.0)
        got = np.asarray(_with_feats(t2c2, feats))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def _with_feats(t2c, feats):
    t2c.encode_features = lambda images: images  # images ARE features here
    return t2c.encode_image(feats)


def test_fit_aligner_pipeline(monkeypatch):
    """fit_aligner drives encode_features + the CLIP tower stub over a
    loader and lands on the W relating them. The fixture is constructed so
    the stub CLIP embedding IS a linear map of the model features
    (G = F @ W_true — both towers read the same normalized RGB slice), so
    the recovered aligner must reproduce it on held-out data."""
    rng = np.random.default_rng(3)
    d_feat, d_clip = 12, 7

    from bcosification_tpu.data.presets import CLIP_MEAN, CLIP_STD

    P = rng.standard_normal((8 * 8 * 3, d_feat)).astype(np.float32) * 0.1
    W_true = rng.standard_normal((d_feat, d_clip)).astype(np.float32)

    def encode_features(images):
        z = (images[..., :3] - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        return z.reshape(z.shape[0], -1) @ jnp.asarray(P)

    class StubVisual:
        def apply(self, v, x, train=False):
            # fit_aligner feeds the CLIP tower the normalized RGB slice;
            # the stub embeds it through P @ W_true
            return x.reshape(x.shape[0], -1) @ v

    t2c = _bare_t2c(encode_features)
    t2c.clip_visual = StubVisual()
    t2c.clip_visual_vars = jnp.asarray(P @ W_true)

    def loader():
        for _ in range(4):
            yield (jnp.asarray(rng.random((16, 8, 8, 6), dtype=np.float32)),)

    t2c.fit_aligner(loader(), ridge=1e-6)
    assert t2c.W.shape == (d_feat, d_clip) and t2c.b is None
    np.testing.assert_allclose(t2c.W, W_true, atol=1e-2)
    # held-out batch: aligned features track the stub CLIP embedding
    x = jnp.asarray(rng.random((8, 8, 8, 6), dtype=np.float32))
    got = np.asarray(t2c.encode_image(x))
    want = np.asarray(
        t2c.clip_visual.apply(
            t2c.clip_visual_vars,
            (x[..., :3] - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD),
        )
    )
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.01, rel


def test_model_type_wiring_loads_pretrained_aligner(monkeypatch, tmp_path):
    """load_clip(model_type="text2concept_clip", pretrained=<aligner.npz>)
    returns a bundle whose encode_image applies the saved W — ≙ the
    reference loader consuming its pretrained aligner file
    (text2concept_clip.py:43) — and the zeroshot metric runs end-to-end."""
    import clip_benchmark.models as models_pkg
    from bcosification_tpu.clip.tokenizer import tokenize
    from clip_benchmark.datasets.builder import DummyDataset
    from clip_benchmark.metrics import zeroshot_classification
    from clip_benchmark.models import ModelBundle
    from flax import linen as nn

    rng = np.random.default_rng(4)
    d_feat, d_clip = 10, 16

    proj = jnp.asarray(
        rng.standard_normal((64 * 64 * 3, d_feat)).astype(np.float32) * 0.02
    )

    def encode_image(images):
        return images.reshape(images.shape[0], -1) @ proj

    class TinyText(nn.Module):
        @nn.compact
        def __call__(self, tokens, *, train=False, explain=False):
            emb = self.param("emb", nn.initializers.normal(0.1), (512, d_clip))
            return emb[jnp.clip(tokens, 0, 511)].mean(axis=1)

    text = TinyText()
    tvars = text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))

    def fake_load_bcos_clip(model_name, pretrained, experiment_path, **kw):
        assert pretrained == "", "aligner npz must not reach the model loader"
        bundle = ModelBundle(encode_image, text, tvars, tokenize)
        return bundle, None, tokenize

    monkeypatch.setattr(models_pkg, "_load_bcos_clip", fake_load_bcos_clip)

    # TextToConcept.__init__ builds real CLIP towers; stub the loader it uses
    import importlib

    clip_load_mod = importlib.import_module("bcosification_tpu.clip.load")

    class StubVisual:
        def apply(self, v, x, train=False):
            return x.reshape(x.shape[0], -1) @ v

    stub_vars = jnp.zeros((64 * 64 * 3, d_clip), jnp.float32)
    monkeypatch.setattr(
        clip_load_mod,
        "load",
        lambda name="RN50", pretrained=True: (
            StubVisual(), stub_vars, text, tvars, 100.0, {"image_resolution": 64}
        ),
    )

    W = rng.standard_normal((d_feat, d_clip)).astype(np.float32)
    aligner = tmp_path / "aligner.npz"
    np.savez(aligner, W=W)

    bundle, _, _ = models_pkg.load_clip(
        model_type="text2concept_clip",
        model_name="ignored",
        pretrained=str(aligner),
    )
    assert bundle.text2concept.W is not None
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    got = np.asarray(bundle.encode_image(x))
    want = np.asarray(encode_image(x)) @ W
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # the aligned bundle runs the real zeroshot metric end-to-end
    from bcosification_tpu.data.loader import DataLoader

    ds = DummyDataset()
    metrics = zeroshot_classification.evaluate(
        bundle, DataLoader(ds, 16, num_workers=2), ds.classes, ds.templates
    )
    assert 0.0 <= metrics["acc1"] <= 1.0

"""Greedy captioner: a REAL in-framework generative path for --task captioning.

Covers: teacher-forcing training converges, autoregressive greedy decode
reproduces memorised captions, captioning.evaluate scores a trained bundle
(~perfect BLEU), and the bcos_captioner model-type wiring in the benchmark
loader registry. Ref task surface: `/root/reference/CLIP_benchmark/
clip_benchmark/metrics/captioning.py:1-99`.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.models import captioner as cap_lib

VOCAB = ["<pad>"] + [f"w{i}" for i in range(13)] + ["<bos>", "<eos>"]
BOS, EOS = 14, 15


def _detok(tokens):
    return " ".join(VOCAB[t] for t in tokens if t not in (BOS,))


@pytest.fixture(scope="module")
def trained():
    import optax

    model = cap_lib.GreedyCaptioner(
        vocab_size=16, hidden=32, bos=BOS, eos=EOS, max_len=6
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    # three distinct captions, EOS-padded to max_len+1 (incl. leading BOS)
    seqs = np.array(
        [
            [BOS, 1, 2, 3, EOS, EOS, EOS],
            [BOS, 4, 5, EOS, EOS, EOS, EOS],
            [BOS, 6, 7, 8, 9, EOS, EOS],
        ],
        np.int32,
    )
    tokens = jnp.asarray(seqs)
    variables = model.init(jax.random.PRNGKey(0), feats, tokens[:, :-1])
    tx = optax.adam(5e-2)
    opt_state = tx.init(variables["params"])
    step = cap_lib.make_caption_train_step(model, tx)
    params = variables["params"]
    first_loss = None
    for i in range(300):
        params, opt_state, loss = step(params, opt_state, feats, tokens)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < 0.05 < first_loss, (first_loss, float(loss))
    return model, {"params": params}, feats, seqs


def test_caption_loss_ignores_any_padding_after_eos():
    """The loss mask must cut at the FIRST EOS regardless of padding scheme:
    CLIP's tokenize pads with zeros, not repeated EOS — a zero-padded and an
    EOS-padded version of the same caption must give the same loss."""
    model = cap_lib.GreedyCaptioner(
        vocab_size=16, hidden=16, bos=BOS, eos=EOS, max_len=6
    )
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
    eos_padded = jnp.asarray([[BOS, 1, 2, 3, EOS, EOS, EOS]], jnp.int32)
    zero_padded = jnp.asarray([[BOS, 1, 2, 3, EOS, 0, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), feats, eos_padded[:, :-1])
    l_eos = float(cap_lib.caption_loss(model, variables, feats, eos_padded))
    l_zero = float(cap_lib.caption_loss(model, variables, feats, zero_padded))
    np.testing.assert_allclose(l_zero, l_eos, rtol=1e-6)


def test_greedy_decode_memorises(trained):
    model, variables, feats, seqs = trained
    toks = np.asarray(cap_lib.greedy_generate(model, variables, feats))
    assert toks.shape == (3, 6)
    for i in range(3):
        want = [t for t in seqs[i][1:] if t != EOS]
        got = []
        for t in toks[i]:
            if t == EOS:
                break
            got.append(int(t))
        assert got == want, (i, got, want)


def test_captioning_evaluate_trained_bundle(trained):
    from clip_benchmark.metrics import captioning

    model, variables, feats, seqs = trained

    class Bundle:
        def generate(self, images):
            toks = cap_lib.greedy_generate(model, variables, feats[: len(images)])
            return cap_lib.decode_tokens(np.asarray(toks), eos=EOS, detokenize=_detok)

    refs = []
    for s in seqs:
        refs.append([_detok([t for t in s[1:] if t != EOS])])
    data = [(np.zeros((3, 2, 2, 3), np.float32), refs)]
    metrics = captioning.evaluate(Bundle(), data)
    assert metrics["Bleu_1"] == pytest.approx(1.0)
    assert metrics["CIDEr"] > 5.0
    assert metrics["SPICE"] == "unsupported"


def test_bcos_captioner_loader_wiring(monkeypatch):
    """load_clip('bcos_captioner') attaches a working .generate without
    needing the RN50 tower (stubbed image encoder)."""
    import clip_benchmark.models as M

    class FakeBundle:
        jittable = True
        cosine_power = 0

        def encode_image(self, images):
            return jnp.ones((images.shape[0], 8), jnp.float32)

    monkeypatch.setattr(
        M, "_load_bcos_clip", lambda *a, **k: (FakeBundle(), None, None)
    )
    bundle, _, _ = M.load_clip("bcos_captioner", "resnet50clip", "")
    caps = bundle.generate(np.zeros((2, 224, 224, 6), np.float32))
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)

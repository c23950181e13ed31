"""Tokenizer fuzz differential: our CLIP BPE tokenizer must produce the SAME
token ids as the reference's vendored OpenAI tokenizer
(/root/reference/CLIP/clip/simple_tokenizer.py) on randomly composed text —
zeroshot parity depends on byte-identical ids. ftfy is absent in this image;
both sides get an identity fix_text (ours already import-gates it), so the
comparison covers the cleaning, byte<->unicode table and BPE merge loop."""
import random
import sys
import types

import pytest

from reference_loader import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

REF_TOK = "/root/reference/CLIP/clip/simple_tokenizer.py"


def _load_reference_tokenizer():
    try:
        import ftfy  # noqa: F401
    except ImportError:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules.setdefault("ftfy", stub)
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_simple_tokenizer", REF_TOK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer()  # default_bpe() points into the reference tree


WORDS = (
    "a the dog cat photo of big small running beautiful person tree "
    "skyline network explanation zebra xylophone quantum 42 2024 covid-19 "
    "e-mail naïve café über señor Zürich東京 émigré"
).split()
PUNCT = list(".,!?;:()[]'\"-/@#$%&*" ) + ["...", "!!", "??", "--"]
EXTRA = ["🙂", "🚀", "&amp;", "&lt;3", "   ", "\t", "\n"]


def _random_text(rng):
    parts = []
    for _ in range(rng.randint(1, 12)):
        r = rng.random()
        if r < 0.70:
            w = rng.choice(WORDS)
            if rng.random() < 0.2:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            parts.append(w)
        elif r < 0.90:
            parts.append(rng.choice(PUNCT))
        else:
            parts.append(rng.choice(EXTRA))
    sep = " " if rng.random() < 0.8 else rng.choice(["  ", " \t ", "\n"])
    return sep.join(parts)


def test_tokenizer_fuzz_matches_reference():
    from bcosification_tpu.clip.tokenizer import SimpleTokenizer

    ref = _load_reference_tokenizer()
    ours = SimpleTokenizer()
    rng = random.Random(20260817)
    n_nonempty = 0
    for i in range(200):
        text = _random_text(rng)
        want = ref.encode(text)
        got = ours.encode(text)
        assert got == want, (i, repr(text), got, want)
        n_nonempty += bool(want)
    assert n_nonempty > 150  # the corpus wasn't degenerate


def test_tokenize_tensor_matches_reference_semantics():
    """clip.tokenize semantics: 77-token context, SOT/EOT framing, truncation
    keeps EOT (reference CLIP/clip/clip.py:195-237)."""
    import numpy as np

    from bcosification_tpu.clip.tokenizer import SimpleTokenizer, tokenize

    ref = _load_reference_tokenizer()
    ours = SimpleTokenizer()
    sot = ours.encoder["<|startoftext|>"]
    eot = ours.encoder["<|endoftext|>"]

    short = "a photo of a dog"
    long = " ".join(["a very long caption about many different things"] * 12)
    arr = np.asarray(tokenize([short, long], truncate=True))
    assert arr.shape == (2, 77)

    want_short = [sot] + ref.encode(short) + [eot]
    assert arr[0, : len(want_short)].tolist() == want_short
    assert arr[0, len(want_short):].sum() == 0

    want_long = ([sot] + ref.encode(long))[:76] + [eot]
    assert arr[1].tolist() == want_long

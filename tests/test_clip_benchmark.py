"""CLIP benchmark harness smoke tests (mirrors the upstream fork's
`tests/test_clip_benchmark.py` dummy-dataset pattern, with a tiny synthetic
model bundle so the metric machinery runs fast on CPU)."""
import json
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_benchmark.datasets.builder import DummyDataset, build_dataset
from clip_benchmark.metrics import linear_probe, zeroshot_classification
from clip_benchmark.models import ModelBundle

from flax import linen as nn


class TinyText(nn.Module):
    dim: int = 16

    @nn.compact
    def __call__(self, tokens, *, train=False, explain=False):
        emb = self.param("emb", nn.initializers.normal(0.1), (512, self.dim))
        return emb[jnp.clip(tokens, 0, 511)].mean(axis=1)


@pytest.fixture
def bundle(rng):
    text = TinyText()
    tvars = text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    proj = jnp.asarray(rng.standard_normal((64 * 64 * 3, 16)).astype(np.float32) * 0.02)

    def encode_image(images):
        return images.reshape(images.shape[0], -1) @ proj

    from bcosification_tpu.clip.tokenizer import tokenize

    return ModelBundle(encode_image, text, tvars, tokenize)


def _loader(ds, bs=16):
    from bcosification_tpu.data.loader import DataLoader

    return DataLoader(ds, bs, num_workers=2)


def test_dummy_zeroshot(bundle):
    ds = DummyDataset()
    metrics = zeroshot_classification.evaluate(
        bundle, _loader(ds), ds.classes, ds.templates
    )
    assert set(metrics) == {"acc1", "acc5", "mean_per_class_recall"}
    assert 0.0 <= metrics["acc1"] <= 1.0
    # reference zeroshot_classification.py:245-248: top-5 is NaN with the
    # dummy dataset's 3 classes
    assert np.isnan(metrics["acc5"])


def test_dummy_linear_probe(bundle, tmp_path):
    ds = DummyDataset(n=64)
    metrics = linear_probe.evaluate(
        bundle,
        _loader(ds),
        _loader(ds),
        fewshot_epochs=10,
        fewshot_lr=0.5,
        feature_root=str(tmp_path),
    )
    # same train/test random features -> head should fit above chance (1/3)
    assert metrics["lp_acc1"] > 0.4


def test_cosine_power_unpool_logits(rng):
    from bcosification_tpu.training.zeroshot import zeroshot_predict_logits

    feats = jnp.asarray(rng.standard_normal((2, 9, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    out = zeroshot_predict_logits(feats, w, cos_power=2)
    assert out.shape == (2, 4)

    # cos_power=2 weights each location logit by |logit|
    norm = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    logits = 100.0 * norm @ w
    want = (logits * jnp.abs(logits)).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4)


def test_average_precision_perfect():
    scores = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9]])
    targets = np.array([[1, 0], [1, 0], [0, 1]], np.float32)
    ap = zeroshot_classification.average_precision(scores, targets)
    np.testing.assert_allclose(ap, [1.0, 1.0])


def test_cli_parses_reference_args(monkeypatch):
    from clip_benchmark import cli

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "cli.py", "eval", "--dataset", "dummy", "--model_type", "bcos_clip",
            "--cosine_power", "2", "--experiment_path", "/tmp/x",
            "--task", "zeroshot_classification", "--output", "/tmp/out.json",
        ],
    )
    _, args = cli.get_parser_args()
    assert args.which == "eval"
    assert args.cosine_power == 2
    assert args.model_type == "bcos_clip"


def test_cli_dispatches_image_caption_selection(tmp_path, monkeypatch):
    """End-to-end cli run of the sugar_crepe-style task (r5 review: the
    parser accepted it and the metric existed but run() had no branch, so
    the auto-default task for CAPTION_DATASETS raised NotImplementedError)."""
    from clip_benchmark import cli

    out = tmp_path / "ics.json"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "cli.py", "eval", "--dataset", "dummy_retrieval",
            "--model_type", "standard_clip", "--model", "RN50",
            "--pretrained", "none", "--task", "image_caption_selection",
            "--batch_size", "8", "--output", str(out),
        ],
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-init teacher warning
        cli.main()
    rec = json.load(open(out))
    assert rec["task"] == "image_caption_selection"
    assert set(rec["metrics"]) >= {"acc", "text_acc", "image_acc"}
    assert 0.0 <= rec["metrics"]["acc"] <= 1.0


def test_build_csv(tmp_path):
    from clip_benchmark import cli

    p = tmp_path / "r.json"
    json.dump(
        {
            "dataset": "dummy", "model": "RN50", "pretrained": "openai",
            "task": "zeroshot_classification", "metrics": {"acc1": 0.5},
            "language": "en",
        },
        open(p, "w"),
    )

    class A:
        files = [str(p)]
        output = str(tmp_path / "out.csv")

    cli.main_build(A)
    content = open(A.output).read()
    assert "acc1" in content and "RN50 openai" in content


def test_bleu_differential_vs_nltk():
    """Independent oracle: our corpus BLEU (pycocoevalcap semantics: clipped
    n-gram precision + closest-ref brevity penalty) must equal nltk's
    corpus_bleu exactly wherever every order has nonzero overlap. (BLEU-4
    with zero 4-gram overlap intentionally differs: pycocoevalcap floors the
    precision with a tiny epsilon while nltk hard-zeros.)"""
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")

    from clip_benchmark.metrics.captioning import bleu_scores

    cands = [
        "a brown dog runs across the green field".split(),
        "two people are riding bicycles near the beach".split(),
        "a cat sits on a red chair".split(),
        "the group stands around a large wooden table".split(),
        # one candidate with 4-gram overlap so every order is nonzero
        "several people gather at a wooden table near the window".split(),
    ]
    refs = [
        ["a dog runs across a field".split(),
         "the brown dog sprints over the grass".split()],
        ["people ride bikes by the sea".split(),
         "two cyclists near a beach".split()],
        ["a cat is sitting on the chair".split(),
         "a red chair with a cat on it".split()],
        ["several people gather at a wooden table".split(),
         "the group stands by the table".split()],
        ["several people gather at a wooden table".split()],
    ]
    ours = bleu_scores(cands, refs)
    for n in range(1, 5):
        want = nltk_bleu.corpus_bleu(refs, cands, weights=tuple([1.0 / n] * n))
        np.testing.assert_allclose(ours[n - 1], want, rtol=1e-9, err_msg=f"BLEU-{n}")


def test_captioning_scorers_perfect_match():
    from clip_benchmark.metrics.captioning import (
        bleu_scores, cider_d, ptb_tokenize, rouge_l,
    )

    cands = [ptb_tokenize("A dog runs in the park."),
             ptb_tokenize("Two cats sleep on a couch!")]
    refs = [[c] for c in cands]
    bleus = bleu_scores(cands, refs)
    assert len(bleus) == 4
    np.testing.assert_allclose(bleus, 1.0, atol=1e-9)
    assert rouge_l(cands, refs) == pytest.approx(1.0)
    assert cider_d(cands, refs) == pytest.approx(10.0, abs=1e-6)


def test_captioning_scorers_ordering():
    """A near-match must outscore a mismatch on every scorer."""
    from clip_benchmark.metrics.captioning import bleu_scores, cider_d, rouge_l

    ref = [[["a", "dog", "runs", "in", "the", "park"]],
           [["two", "cats", "sleep", "on", "a", "couch"]]]
    near = [["a", "dog", "runs", "in", "a", "park"],
            ["two", "cats", "sleep", "on", "the", "couch"]]
    far = [["quantum", "flux", "capacitor"], ["mitochondria", "powerhouse"]]
    assert bleu_scores(near, ref)[3] > bleu_scores(far, ref)[3]
    assert rouge_l(near, ref) > rouge_l(far, ref)
    assert cider_d(near, ref) > cider_d(far, ref)


def test_captioning_evaluate_with_generative_bundle():
    from clip_benchmark.metrics import captioning

    class GenBundle:
        def generate(self, images):
            return ["a red square"] * len(images)

    data = [
        (np.zeros((2, 4, 4, 3), np.float32),
         [["a red square", "red block"], ["a blue circle"]]),
    ]
    metrics = captioning.evaluate(GenBundle(), data)
    # corpus-level: image 1 matches (3/3 unigrams), image 2 contributes 1/3
    assert metrics["Bleu_1"] == pytest.approx(4 / 6)
    # image 1 is a perfect 3-token match (1 - 0.5/27); image 2 matches only
    # "a" (P=1/3, R=1/3, Fmean=1/3, penalty=0.5 -> 1/6); corpus = mean
    want_meteor = ((1 - 0.5 / 27) + (1 / 3) * 0.5) / 2
    assert metrics["METEOR"] == pytest.approx(want_meteor)
    assert metrics["SPICE"] == "unsupported"  # honest capability report
    assert "CIDEr" in metrics and np.isfinite(metrics["CIDEr"])


def test_captioning_requires_generate(bundle):
    from clip_benchmark.metrics import captioning

    with pytest.raises(NotImplementedError):
        captioning.evaluate(bundle, [])


def test_gated_model_types_informative():
    """External model types are import-gated with install hints (the full
    loader shapes are tested in tests/test_external_models.py)."""
    from clip_benchmark.models import MODEL_TYPES

    assert "ja_clip" in MODEL_TYPES and "nllb_clip" in MODEL_TYPES
    assert "open_clip" in MODEL_TYPES


def test_multilabel_metrics_counts():
    from bcosification_tpu.experiments.utils.metric_utils import MultiLabelMetrics

    m = MultiLabelMetrics(3, 0.0)
    m.update(np.array([[1.0, -1.0, 2.0], [-1.0, 1.0, -2.0]]),
             np.array([[1, 0, 0], [0, 1, 0]]))
    r = m.compute()
    assert (r["True Positives"], r["False Positives"],
            r["True Negatives"], r["False Negatives"]) == (2, 1, 3, 0)
    assert r["Recall"] == 1.0 and r["F-Score"] == pytest.approx(0.8)


def test_cc3m_config_names_match_reference_pattern():
    from bcosification_tpu.experiments.utils.config_utils import (
        get_configs_and_model_factory,
    )

    c, _ = get_configs_and_model_factory("CC3M", "clip_bcosification")
    assert "resnet_50_clip_b2_noBias_randomResizedCrop_sigLip_kd_CC3M_bcosification" in c
    assert (
        "resnet_50_clip_b2_noBias_randomResizedCrop_cyclicLR_sigLip_kd_CC3M_bcosification"
        in c
    )


def test_porter_stemmer_vectors():
    """Against NLTK's PorterStemmer in ORIGINAL_ALGORITHM mode (the classic
    Porter 1980 definition this module implements)."""
    pytest.importorskip("nltk")
    from nltk.stem.porter import PorterStemmer

    from clip_benchmark.metrics.meteor import porter_stem

    oracle = PorterStemmer(mode="ORIGINAL_ALGORITHM")
    words = """caresses ponies ties caress cats feed agreed plastered bled
        motoring sing conflated troubled sized hopping tanned falling hissing
        fizzed failing filing happy sky relational conditional rational
        valency hesitancy digitizer conformably radically differently vilely
        analogously vietnamization predication operator feudalism decisiveness
        hopefulness callousness formality sensitivity sensibility triplicate
        formative formalize electricity electrical hopeful goodness revival
        allowance inference airliner gyroscopic adjustable defensible irritant
        replacement adjustment dependent adoption homologous communism
        activate angularity effective bowdlerize probate rate cease controll
        roll generalization oscillators controlling university universal
        maximum realization mitochondria powerhouse quantum riding rides
        running runs walked walking jumped quickly beautiful beautifully
        organization organizer organized stemming stemmed argues arguing
        argued argument""".split()
    for w in words:
        assert porter_stem(w) == oracle.stem(w), (
            w, porter_stem(w), oracle.stem(w)
        )


def test_meteor_known_values():
    from clip_benchmark.metrics.meteor import meteor, meteor_segment

    # identical 3-token sentences: P=R=1, one chunk -> 1 - 0.5*(1/3)^3
    c = ["the", "cat", "sat"]
    assert meteor_segment(c, [c]) == pytest.approx(1 - 0.5 / 27)
    # disjoint -> 0
    assert meteor_segment(["dog"], [["bird"]]) == 0.0
    # stem-stage matches: cats~cat, running~runs -> m=2, 1 chunk
    assert meteor_segment(["cats", "running"], [["cat", "runs"]]) == pytest.approx(
        1 - 0.5 / 8
    )
    # word order breaks chunks: reversed 2-token match -> 2 chunks,
    # penalty = 0.5 * (2/2)^3 = 0.5
    assert meteor_segment(["cat", "the"], [["the", "cat"]]) == pytest.approx(0.5)
    # best reference wins; corpus = mean over segments
    score = meteor(
        [c, ["dog"]],
        [[["wrong", "words"], c], [["bird"]]],
    )
    assert score == pytest.approx((1 - 0.5 / 27) / 2)


def test_captioning_metrics_include_meteor():
    from clip_benchmark.metrics.captioning import ptb_tokenize
    from clip_benchmark.metrics.meteor import meteor

    cands = [ptb_tokenize("A man riding a horse.")]
    refs = [[ptb_tokenize("a man rides a horse"), ptb_tokenize("someone on a horse")]]
    m = meteor(cands, refs)
    assert 0.5 < m <= 1.0  # rides~riding via stems, most unigrams align


def _onehot_bundle(dim=4):
    """Bundle whose image features are the (flattened) images themselves and
    whose text features decode 'e<i>' captions to one-hot basis vectors —
    retrieval/selection outcomes are then exactly constructible."""

    def encode_texts(captions):
        out = np.zeros((len(captions), dim), np.float32)
        for i, c in enumerate(captions):
            out[i, int(c.strip().lstrip("e"))] = 1.0
        return out

    return ModelBundle(
        encode_image=lambda im: im.reshape(im.shape[0], -1),
        text_model=None,
        text_vars=None,
        tokenizer=None,
        encode_texts_fn=encode_texts,
        jittable=False,
    )


def test_zeroshot_retrieval_exact():
    from clip_benchmark.metrics import zeroshot_retrieval

    dim = 4
    images = np.eye(dim, dtype=np.float32).reshape(dim, 1, 1, dim)
    # captions: images 0..2 get their own basis caption; image 3's caption
    # points at image 0 -> t2i recall@1 = 3/4; image 3 has no matching top-1
    # caption and caption 'e0' is argmax-ambiguous-free
    caps = [["e0"], ["e1"], ["e2"], ["e0"]]
    loader = [(images, caps)]
    m = zeroshot_retrieval.evaluate(_onehot_bundle(dim), loader, recall_k_list=(1, 4))
    # reference key naming: image_retrieval = top-k IMAGES per caption.
    # Captions of images 0-2 rank their own image first; image 3's caption
    # points at image 0 -> 3/4
    assert m["image_retrieval_recall@1"] == pytest.approx(0.75)
    # @4 every caption's image is in the top-4 (there are only 4 images)
    assert m["image_retrieval_recall@4"] == 1.0
    # text_retrieval = top-k CAPTIONS per image: images 0-2 rank a matching
    # caption first; image 3 scores 0 against every caption -> 3/4
    assert m["text_retrieval_recall@1"] == pytest.approx(0.75)
    assert m["text_retrieval_recall@4"] == 1.0


def test_image_caption_selection_exact():
    from clip_benchmark.metrics import image_caption_selection

    dim = 4
    images = np.eye(dim, dtype=np.float32)[:2].reshape(2, 1, 1, dim)
    # sample 0: correct caption first -> counted correct;
    # sample 1: the DISTRACTOR matches the image -> counted wrong
    caps = [["e0", "e1"], ["e0", "e1"]]
    loader = [(images, caps)]
    m = image_caption_selection.evaluate(_onehot_bundle(dim), loader)
    # reference keys: text_acc = each image picks its caption; image_acc is
    # trivially 1 for single-image instances (one candidate image)
    assert m["text_acc"] == pytest.approx(0.5)
    assert m["image_acc"] == 1.0
    assert m["acc"] == pytest.approx(0.5)

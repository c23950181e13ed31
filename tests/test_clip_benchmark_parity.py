"""CLIP_benchmark metric parity vs the reference implementations.

Runs the reference's ACTUAL metric modules
(`/root/reference/CLIP_benchmark/clip_benchmark/metrics/
{zeroshot_retrieval,zeroshot_classification,image_caption_selection}.py`)
with duck-typed torch models over shared random embedding tables, against
our vendored reimplementations on the same data. Locks the subtle parts:
the retrieval direction NAMING (the reference's key says what is retrieved
— a symmetric fixture cannot catch a swap), the binarized actual-recall
semantics with multiple captions per image, acc5 = NaN under 5 classes,
the NON-renormalised mean of loaded classifiers, balanced-accuracy recall,
multilabel AP, and the two-directional all-pairs-correct caption-selection
scoring on Winoground-style multi-image instances.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import (  # noqa: E402
    load_reference_clip_benchmark_metric,
    reference_available,
)

from clip_benchmark.metrics import (  # noqa: E402
    image_caption_selection,
    zeroshot_classification,
    zeroshot_retrieval,
)
from clip_benchmark.models import ModelBundle  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

DIM = 6


class Codebook:
    """str -> fixed random unit-free embedding, shared by both frameworks.
    The duck tokenizer returns the embeddings themselves as 'tokens' and
    encode_text is the identity, so the reference's tokenize->encode chain
    reduces to a table lookup identical to our encode_texts_fn."""

    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)
        self.rows = {}

    def vec(self, s):
        if s not in self.rows:
            self.rows[s] = self.rng.standard_normal(DIM).astype(np.float32)
        return self.rows[s]

    def tokenizer(self, texts, truncate=False):
        return torch.from_numpy(np.stack([self.vec(t) for t in texts]))

    def encode_texts(self, texts):
        return np.stack([self.vec(t) for t in texts])


class RefModel(torch.nn.Module):
    def encode_image(self, x):
        return x

    def encode_text(self, tok):
        return tok


def _bundle(cb):
    return ModelBundle(
        encode_image=lambda im: im.reshape(im.shape[0], -1),
        text_model=None,
        text_vars=None,
        tokenizer=None,
        encode_texts_fn=cb.encode_texts,
        jittable=False,
    )


class _RefDataset:
    def __init__(self, classes):
        self.classes = classes


class _RefLoader:
    """Duck torch dataloader: iterable of (images, target) batches plus the
    `.dataset.classes` attribute the reference's acc5 gate reads."""

    def __init__(self, batches, classes):
        self.batches = batches
        self.dataset = _RefDataset(classes)

    def __iter__(self):
        return iter(self.batches)


def _image_table(n, seed):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(np.float32)


# ---------------------------------------------------------------- retrieval


def test_retrieval_matches_reference():
    ref = load_reference_clip_benchmark_metric("zeroshot_retrieval")
    cb = Codebook(1)
    imgs = _image_table(12, 2)
    caps = [[f"cap_{i}_{j}" for j in range(1 + i % 3)] for i in range(12)]

    ref_loader = [
        (torch.from_numpy(imgs[s : s + 4]), caps[s : s + 4]) for s in (0, 4, 8)
    ]
    want = ref.evaluate(
        RefModel(), ref_loader, cb.tokenizer, device="cpu", amp=False,
        recall_k_list=[1, 2, 5],
    )

    our_loader = [
        (imgs[s : s + 4].reshape(4, 1, 1, DIM), caps[s : s + 4])
        for s in (0, 4, 8)
    ]
    got = zeroshot_retrieval.evaluate(_bundle(cb), our_loader, recall_k_list=(1, 2, 5))

    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6), k
    # guard against a symmetric fixture: the directions must actually differ
    assert any(
        want[f"image_retrieval_recall@{k}"] != want[f"text_retrieval_recall@{k}"]
        for k in (1, 2, 5)
    )


# ----------------------------------------------------------------- zeroshot


def _zeroshot_data(n_classes, n=40, seed=3):
    classnames = [f"class {k}" for k in range(n_classes)]
    # reference-convention {c} placeholders (format_template handles both)
    templates = ["a photo of a {c}.", "art of the {c}.", "a {c} in the wild."]
    imgs = _image_table(n, seed)
    targets = np.random.default_rng(seed + 1).integers(0, n_classes, n)
    batches_ref = [
        (torch.from_numpy(imgs[s : s + 16]), torch.from_numpy(targets[s : s + 16]))
        for s in range(0, n, 16)
    ]
    batches_ours = [
        (imgs[s : s + 16].reshape(-1, 1, 1, DIM), targets[s : s + 16])
        for s in range(0, n, 16)
    ]
    return classnames, templates, batches_ref, batches_ours


@pytest.mark.parametrize("n_classes", [7, 3])
def test_zeroshot_classification_matches_reference(n_classes):
    ref = load_reference_clip_benchmark_metric("zeroshot_classification")
    cb = Codebook(4)
    classnames, templates, batches_ref, batches_ours = _zeroshot_data(n_classes)

    want = ref.evaluate(
        RefModel(), _RefLoader(batches_ref, classnames), cb.tokenizer,
        classnames, templates, device="cpu", amp=False,
    )
    got = zeroshot_classification.evaluate(
        _bundle(cb), batches_ours, classnames, templates
    )

    assert set(got) == set(want) == {"acc1", "acc5", "mean_per_class_recall"}
    assert got["acc1"] == pytest.approx(want["acc1"], abs=1e-6)
    assert got["mean_per_class_recall"] == pytest.approx(
        want["mean_per_class_recall"], abs=1e-9
    )
    if n_classes >= 5:
        assert got["acc5"] == pytest.approx(want["acc5"], abs=1e-6)
    else:
        assert math.isnan(want["acc5"]) and math.isnan(got["acc5"])


def test_zeroshot_cupl_dict_templates_match_reference():
    """CuPL-style dict templates: classname -> its own prompt list
    (reference zeroshot_classification.py:43-45)."""
    ref = load_reference_clip_benchmark_metric("zeroshot_classification")
    cb = Codebook(13)
    classnames, _, batches_ref, batches_ours = _zeroshot_data(7, seed=14)
    templates = {c: [f"{c} close up", f"a drawing of {c}"] for c in classnames}

    want = ref.evaluate(
        RefModel(), _RefLoader(batches_ref, classnames), cb.tokenizer,
        classnames, templates, device="cpu", amp=False,
    )
    got = zeroshot_classification.evaluate(
        _bundle(cb), batches_ours, classnames, templates
    )
    for k in ("acc1", "acc5", "mean_per_class_recall"):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


def test_zeroshot_multilabel_map_matches_reference():
    ref = load_reference_clip_benchmark_metric("zeroshot_classification")
    cb = Codebook(5)
    classnames = [f"thing {k}" for k in range(6)]
    templates = ["a photo of a {c}."]
    imgs = _image_table(30, 6)
    labels = (np.random.default_rng(7).random((30, 6)) > 0.6).astype(np.float32)
    # every class needs at least one positive for a defined AP on both sides
    labels[np.arange(6), np.arange(6)] = 1.0

    want = ref.evaluate(
        RefModel(),
        _RefLoader([(torch.from_numpy(imgs), torch.from_numpy(labels))], classnames),
        cb.tokenizer, classnames, templates, device="cpu", amp=False,
    )
    got = zeroshot_classification.evaluate(
        _bundle(cb), [(imgs.reshape(-1, 1, 1, DIM), labels)], classnames, templates
    )
    assert set(got) == set(want) == {"mean_average_precision"}
    assert got["mean_average_precision"] == pytest.approx(
        want["mean_average_precision"], abs=1e-7
    )


def test_zeroshot_loaded_classifiers_match_reference(tmp_path):
    """The load_clfs path plain-averages the saved classifiers WITHOUT
    renormalising (reference :215-219)."""
    ref = load_reference_clip_benchmark_metric("zeroshot_classification")
    cb = Codebook(8)
    classnames, templates, batches_ref, batches_ours = _zeroshot_data(7, seed=9)
    rng = np.random.default_rng(10)
    clfs = [rng.standard_normal((DIM, 7)).astype(np.float32) * (i + 1) for i in range(2)]
    ref_paths, our_paths = [], []
    for i, c in enumerate(clfs):
        rp, op = tmp_path / f"c{i}.pt", tmp_path / f"c{i}.npy"
        torch.save(torch.from_numpy(c), rp)
        np.save(op, c)
        ref_paths.append(str(rp))
        our_paths.append(str(op))

    want = ref.evaluate(
        RefModel(), _RefLoader(batches_ref, classnames), cb.tokenizer,
        classnames, templates, device="cpu", amp=False, load_clfs=ref_paths,
    )
    got = zeroshot_classification.evaluate(
        _bundle(cb), batches_ours, classnames, templates, load_clfs=our_paths
    )
    for k in ("acc1", "acc5", "mean_per_class_recall"):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


# -------------------------------------------------------- caption selection


def test_caption_selection_matches_reference():
    """Winoground-style instances: 2 images x 2 captions, matched pairwise in
    both directions (reference image_caption_selection.py:60-78)."""
    ref = load_reference_clip_benchmark_metric("image_caption_selection")
    cb = Codebook(11)
    rng = np.random.default_rng(12)
    B, NIM = 10, 2
    imgs = rng.standard_normal((B, NIM, DIM)).astype(np.float32)
    caps = [[f"inst{i} cap{j}" for j in range(2)] for i in range(B)]

    # reference consumes [B, nim, C, H, W]; C=1, H=1, W=DIM
    ref_loader = [(torch.from_numpy(imgs.reshape(B, NIM, 1, 1, DIM)), caps)]
    want = ref.evaluate(RefModel(), ref_loader, cb.tokenizer, device="cpu", amp=False)

    our_loader = [(imgs.reshape(B, NIM, 1, 1, DIM), caps)]
    got = image_caption_selection.evaluate(_bundle(cb), our_loader)

    assert set(got) == set(want) == {"image_acc", "text_acc", "acc"}
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6), k
    # random pairings must produce a non-degenerate mix
    assert 0.0 < want["acc"] < 1.0 or want["image_acc"] != want["text_acc"]

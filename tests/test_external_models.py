"""ja_clip / nllb_clip / open_clip loader shapes: with the external package
present (faked here), --model_type ja_clip must drive the full zeroshot
pipeline; without it, a clean ImportError with the install hint (the
reference's import-gating, not a blanket NotImplementedError)."""
import sys
import types

import numpy as np
import pytest


def _fake_japanese_clip():
    import torch

    mod = types.ModuleType("japanese_clip")

    class _Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.vis = torch.nn.Conv2d(3, 8, kernel_size=16, stride=16)
            self.txt = torch.nn.Embedding(100, 8)

        def get_image_features(self, pixel_values):
            return self.vis(pixel_values).mean(dim=(2, 3))

        def get_text_features(self, input_ids, attention_mask=None, position_ids=None):
            assert attention_mask is not None, "ja_clip needs the full dict"
            emb = self.txt(input_ids) * attention_mask[..., None]
            return emb.sum(1) / attention_mask.sum(1, keepdim=True)

    def load(pretrained, device="cpu", cache_dir=None):
        def transform(img):
            arr = np.asarray(img.resize((32, 32)), np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1))

        return _Model().to(device).eval(), transform

    def load_tokenizer():
        return {"vocab": 100}

    def tokenize(texts, tokenizer=None, device="cpu"):
        ids = torch.stack([
            torch.tensor([(hash(t) + i) % 100 for i in range(8)]) for t in texts
        ])
        return {
            "input_ids": ids.to(device),
            "attention_mask": torch.ones_like(ids, dtype=torch.float32).to(device),
            "position_ids": torch.arange(8).expand_as(ids).to(device),
        }

    mod.load = load
    mod.load_tokenizer = load_tokenizer
    mod.tokenize = tokenize
    return mod


def test_ja_clip_end_to_end(monkeypatch):
    from PIL import Image

    monkeypatch.setitem(sys.modules, "japanese_clip", _fake_japanese_clip())
    from clip_benchmark.models import load_clip
    from clip_benchmark.metrics.zeroshot_classification import (
        zero_shot_classifier,
        run_classification,
        accuracy,
    )

    bundle, transform, tokenizer = load_clip(
        model_type="ja_clip", model_name="ja", pretrained="rinna/japanese-clip-vit-b-16"
    )
    assert bundle.jittable is False and bundle.text_model is None

    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8))
    x = transform(img)
    assert x.shape == (32, 32, 3) and x.dtype == np.float32  # numpy HWC out

    feats = bundle.encode_image(np.stack([x, x]))
    assert feats.shape == (2, 8) and np.isfinite(feats).all()

    clf = zero_shot_classifier(bundle, ["犬", "猫", "鳥"], ["{}の写真"])
    assert clf.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(clf), axis=0), 1.0, rtol=1e-5)

    loader = [(np.stack([x] * 4), np.array([0, 1, 2, 0]))]
    logits, target = run_classification(bundle, clf, loader)
    assert logits.shape == (4, 3) and np.isfinite(logits).all()
    assert 0.0 <= accuracy(logits, target, topk=(1,))[0] <= 1.0


def test_ja_clip_import_gated(monkeypatch):
    monkeypatch.setitem(sys.modules, "japanese_clip", None)
    from clip_benchmark.models import load_clip

    with pytest.raises(ImportError, match="japanese-clip"):
        load_clip(model_type="ja_clip", model_name="ja", pretrained="x")


def test_open_clip_import_gated(monkeypatch):
    monkeypatch.setitem(sys.modules, "open_clip", None)
    from clip_benchmark.models import load_clip

    with pytest.raises(ImportError, match="open_clip"):
        load_clip(model_type="open_clip", model_name="ViT-B-32", pretrained="laion2b")
    with pytest.raises(ImportError, match="open_clip"):
        load_clip(model_type="nllb_clip", model_name="nllb-clip-base", pretrained="v1")


def test_nllb_language_resolution():
    from clip_benchmark.models.nllb_clip import resolve_lang, set_language

    assert resolve_lang("en") == "eng_Latn"
    assert resolve_lang("jp") == "jpn_Jpan"
    assert resolve_lang("zho_Hans") == "zho_Hans"  # FLORES identity
    with pytest.raises(KeyError):
        resolve_lang("klingon")

    calls = []

    class _Inner:
        def set_src_lang_special_tokens(self, lang):
            calls.append(lang)

    tok = types.SimpleNamespace(tokenizer=_Inner())
    set_language(tok, "de")
    assert calls == ["deu_Latn"]

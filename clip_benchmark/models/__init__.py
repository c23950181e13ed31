"""Model loaders for the benchmark CLI.

Parity target: `/root/reference/CLIP_benchmark/clip_benchmark/models/
__init__.py` + `bcos_clip.py` / `bcos_clip_cc3m.py` / `standard_clip.py`:
`load_clip(model_type, ...) -> (model_bundle, transform, tokenizer)`.

The bundle interface consumed by the metrics:
- encode_image(images jnp [B,H,W,C]) -> features
- encode_texts(list[str]) -> np features (text tower; B-cos image-only models
  fall back to the vanilla CLIP RN50 text tower, the reference's behaviour at
  `metrics/zeroshot_classification.py:54-58`)
- text_model / text_vars for prompt-ensembled classifiers
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

MODEL_TYPES = [
    "open_clip",
    "standard_clip",
    "bcos_clip",
    "bcos_clip_cc3m",
    "bcos_captioner",
    "text2concept_clip",
    "ja_clip",
    "nllb_clip",
]

__all__ = ["MODEL_TYPES", "load_clip", "ModelBundle"]


@dataclasses.dataclass
class ModelBundle:
    encode_image: Callable
    text_model: Any
    text_vars: Any
    tokenizer: Callable
    cosine_power: int = 0
    # external (torch-backed) models: a direct text encoder instead of the
    # JAX text_model/apply path, and jittable=False so metrics call
    # encode_image eagerly (it returns numpy, not traced arrays)
    encode_texts_fn: Optional[Callable] = None
    jittable: bool = True
    # lazily-built shared jit of the text tower: zeroshot classifier building
    # calls encode_texts once PER CLASS, so a fresh jax.jit per call would
    # re-trace and re-compile the text transformer ~1000x on ImageNet
    _text_encode_jit: Optional[Callable] = dataclasses.field(
        default=None, repr=False, compare=False
    )

    def encode_texts(self, texts: List[str], batch: int = 256) -> np.ndarray:
        outs = []
        if self.encode_texts_fn is not None:
            for i in range(0, len(texts), batch):
                outs.append(np.asarray(self.encode_texts_fn(texts[i : i + batch])))
            return np.concatenate(outs)
        if self._text_encode_jit is None:
            self._text_encode_jit = jax.jit(
                lambda v, t: self.text_model.apply(v, t)
            )
        for i in range(0, len(texts), batch):
            tokens = jnp.asarray(self.tokenizer(texts[i : i + batch]))
            outs.append(np.asarray(self._text_encode_jit(self.text_vars, tokens)))
        return np.concatenate(outs)


def jit_encode_image(model_bundle) -> Callable:
    """jax.jit the bundle's image encoder when it is a traced-JAX function;
    external torch-backed bundles (ja_clip/nllb_clip/open_clip) run eagerly."""
    if getattr(model_bundle, "jittable", True):
        return jax.jit(model_bundle.encode_image)
    return model_bundle.encode_image


def _clip_eval_transform(n_px: int = 224, normalize: bool = False):
    from bcosification_tpu.data import transforms as T
    from bcosification_tpu.data.presets import CLIP_MEAN, CLIP_STD

    trans = [T.Resize(n_px, interpolation="bicubic"), T.CenterCrop(n_px), T.ToFloatArray()]
    if normalize:
        trans.append(T.Normalize(CLIP_MEAN, CLIP_STD))
    return T.Compose(trans)


def _addinverse_transform(n_px: int = 224):
    from bcosification_tpu.data import transforms as T

    return T.Compose(
        [T.Resize(n_px), T.CenterCrop(n_px), T.ToFloatArray(), T.AddInverse()]
    )


def _load_bcos_clip(model_name: str, pretrained: str, experiment_path: Optional[str],
                    dataset_dir: str = "clip_bcosification"):
    """models/bcos_clip.py:20-39: Experiment under
    experiments/ImageNet/<dataset_dir>/, AddInverse transform, clip.tokenize;
    attn-unpool variants read cosine_power from `pretrained`."""
    from bcosification_tpu.clip.load import load as clip_load
    from bcosification_tpu.clip.tokenizer import tokenize
    from bcosification_tpu.experiments.utils import Experiment

    dataset = "CC3M" if dataset_dir == "clip_bcosification_cc3m" else "ImageNet"
    base_network = "clip_bcosification"
    if experiment_path:
        experiment = Experiment(path=experiment_path)
    else:
        experiment = Experiment(dataset, base_network, model_name)

    try:
        model, variables = experiment.load_trained_model("best_any")
    except FileNotFoundError:
        print("No trained checkpoint; using conversion-time init")
        model, variables = experiment.get_model()

    cosine_power = 0
    if experiment.config.get("model", {}).get("attn_unpool", False):
        try:
            cosine_power = int(pretrained)
        except (TypeError, ValueError):
            cosine_power = int(experiment.config["model"].get("cos_power", 1))

    # text tower fallback: vanilla CLIP RN50
    _, _, text_model, text_vars, _, _ = clip_load("RN50")

    def encode_image(images):
        return model.apply(variables, images, train=False)

    bundle = ModelBundle(encode_image, text_model, text_vars, tokenize, cosine_power)
    return bundle, _addinverse_transform(), tokenize


def _load_bcos_captioner(
    model_name: str, pretrained: str, experiment_path: Optional[str]
):
    """The in-framework generative bundle for `--task captioning`: a B-cos
    CLIP image tower + the trainable greedy caption head
    (bcosification_tpu/models/captioner.py). ``pretrained`` may point to a
    saved head params .npz (written by flax serialization in training code);
    otherwise the head is random-init (the task still runs end-to-end,
    mirroring the reference's untrained-model fallback behaviour)."""
    from bcosification_tpu.models import captioner as cap_lib

    bundle, transform, tok = _load_bcos_clip(model_name, "", experiment_path)
    head = cap_lib.GreedyCaptioner(vocab_size=49408)

    def feature_dim():
        probe = jnp.zeros((1, 224, 224, 6), jnp.float32)
        return jax.eval_shape(bundle.encode_image, probe).shape[-1]

    variables = head.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, feature_dim()), jnp.float32),
        jnp.zeros((1, 1), jnp.int32),
    )
    if pretrained and pretrained.endswith(".npz"):
        import flax.serialization

        with open(pretrained, "rb") as f:
            variables = flax.serialization.from_bytes(variables, f.read())

    encode = jax.jit(bundle.encode_image)
    gen = jax.jit(lambda feats: cap_lib.greedy_generate(head, variables, feats))

    def generate(images) -> List[str]:
        feats = encode(jnp.asarray(images))
        if feats.ndim == 3:  # attn-unpool spatial features -> mean-pool
            feats = feats.mean(axis=1)
        return cap_lib.decode_tokens(np.asarray(gen(feats)), eos=head.eos)

    bundle.generate = generate
    bundle.caption_head = head
    bundle.caption_variables = variables
    return bundle, transform, tok


def _load_standard_clip(model_name: str, pretrained: str):
    import re
    import warnings

    from bcosification_tpu.clip.load import available_models
    from bcosification_tpu.clip.load import load as clip_load
    from bcosification_tpu.clip.tokenizer import tokenize

    # resolve benchmark-style names ("ViT-B-32") to OpenAI tower names
    # ("ViT-B/32"); clip.load supports the full RN + ViT families, so only
    # genuinely unknown names fall back to RN50 — and loudly, never the old
    # silent remap that attributed RN50 numbers to ViT rows (r5 review)
    name = model_name
    if name not in available_models():
        alt = re.sub(r"^(ViT-[A-Za-z]+)-(\d+.*)$", r"\1/\2", name)
        if alt in available_models():
            name = alt
        else:
            warnings.warn(
                f"standard_clip: unknown model {model_name!r}; "
                f"falling back to RN50 (available: {available_models()})"
            )
            name = "RN50"
    visual, visual_vars, text_model, text_vars, _, cfg = clip_load(name)

    def encode_image(images):
        return visual.apply(visual_vars, images, train=False)

    bundle = ModelBundle(encode_image, text_model, text_vars, tokenize)
    return bundle, _clip_eval_transform(cfg["image_resolution"], normalize=True), tokenize


def load_clip(
    model_type: str = "standard_clip",
    model_name: str = "RN50",
    pretrained: str = "",
    cache_dir: Optional[str] = None,
    device=None,
    cosine_power: int = 1,
    experiment_path: Optional[str] = None,
):
    if model_type == "bcos_clip":
        return _load_bcos_clip(model_name, pretrained, experiment_path)
    if model_type == "bcos_clip_cc3m":
        return _load_bcos_clip(
            model_name, pretrained, experiment_path, dataset_dir="clip_bcosification_cc3m"
        )
    if model_type == "standard_clip":
        return _load_standard_clip(model_name, pretrained)
    if model_type == "bcos_captioner":
        return _load_bcos_captioner(model_name, pretrained, experiment_path)
    if model_type == "text2concept_clip":
        # align a (B-cos) vision model's features into CLIP space. When
        # ``pretrained`` points to a saved aligner npz (containing "W"), it
        # is loaded — ≙ the reference loader consuming a pretrained aligner
        # file (ref models/text2concept_clip.py:43); otherwise the caller
        # must fit_aligner on an alignment set.
        import os as _os

        aligner_path = None
        if pretrained and pretrained.endswith(".npz") and _os.path.exists(pretrained):
            with np.load(pretrained) as _data:
                if "W" in _data.files:
                    aligner_path = pretrained
        bundle, transform, tok = _load_bcos_clip(
            model_name, "" if aligner_path else pretrained, experiment_path
        )
        from clip_benchmark.models.text2concept import TextToConcept

        t2c = TextToConcept(bundle.encode_image)
        if aligner_path:
            t2c.load_aligner(aligner_path)
        bundle = ModelBundle(
            t2c.encode_image, t2c.text_model, t2c.text_vars, tok, bundle.cosine_power
        )
        bundle.text2concept = t2c
        return bundle, transform, tok
    if model_type == "open_clip":
        from clip_benchmark.models.open_clip import load_open_clip

        return load_open_clip(model_name, pretrained, cache_dir=cache_dir)
    if model_type == "ja_clip":
        from clip_benchmark.models.japanese_clip import load_japanese_clip

        return load_japanese_clip(pretrained, cache_dir=cache_dir)
    if model_type == "nllb_clip":
        from clip_benchmark.models.nllb_clip import load_nllb_clip

        return load_nllb_clip(model_name, pretrained, cache_dir=cache_dir)
    raise ValueError(f"unknown model_type {model_type!r}")

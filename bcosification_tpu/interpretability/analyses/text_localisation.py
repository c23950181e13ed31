"""Text-grounded localisation for B-cosified CLIP models.

Parity target: `/root/reference/interpretability/analyses/
text_localisation.py:16-256`: embed a prompt-ensembled phrase with the CLIP
text tower (:58-65), run the student image tower in explanation mode, score
`logits = f(x) . t`, with attn-unpool per-location logits optionally
cosine-power pooled / argmax-masked / max-normed (:80-95), then one backward
pass for the dynamic-linear weights W(x) and the colour explanation map.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.explain.core import gradient_to_image
from bcosification_tpu.interpretability.analyses.utils import Analyser

__all__ = ["TextLocalisationAnalyser", "embed_phrase", "compute_attributions"]

DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a photo of the {}.",
    "a photo of one {}.",
)


def embed_phrase(text_model, text_vars, phrase: str, templates=DEFAULT_TEMPLATES):
    """Prompt-ensembled phrase embedding (text_localisation.py:58-65)."""
    from bcosification_tpu.clip.tokenizer import tokenize

    tokens = jnp.asarray(tokenize([t.format(phrase) for t in templates]))
    emb = text_model.apply(text_vars, tokens)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    emb = emb.mean(0)
    return emb / jnp.linalg.norm(emb)


def compute_attributions(
    student,
    student_vars,
    text_embedding,
    image,  # [1, H, W, 6] AddInverse-encoded
    *,
    pool_cosine: int = 1,
    norm_max_cosine: bool = False,
    smooth: int = 0,
    alpha_percentile: float = 99.5,
):
    """One explanation-mode forward + backward for the text-grounded heatmap.

    Numerically exact port of the reference's ``compute_attributions``
    (text_localisation.py:68-126), locked end-to-end by
    tests/test_textloc_parity.py:

    - features are cosine-normalised DIFFERENTIABLY (ref :77 has no detach).
      Since the explain-mode tower is dynamic-linear in x, the cosine score
      is 0-homogeneous — so input×gradient contributions sum to ~0 (a pure
      contrast map), unlike the raw-dot path whose contributions sum to the
      score.
    - attn-unpool pooling (ref :80-95, flags only apply to unpool feats):
      ``pool_cosine == 0`` argmax-masks the per-location cosines (then the
      final max rides the mask); ``norm_max_cosine`` divides by the detached
      max |cosine| over locations; ``pool_cosine > 1`` multiplies by the
      detached |cosine|^(p-1); then MEAN over locations (ref :95 — not sum).
    - ``smooth``/``alpha_percentile`` feed the render's alpha channel
      (identical to gradient_to_image; ref :108-119), and the returned
      clipped contribution map / vrange follow ref :121-124.
    """
    if pool_cosine == 0 and norm_max_cosine:
        # ref :85-92: the argmax path reshapes to (1, HW), whose dim-0 abs-max
        # is the row itself — dividing yields 0/0 on every masked entry
        raise ValueError("pool_cosine=0 with norm_max_cosine yields NaN "
                         "(reference semantics); use one or the other")

    def head_fn(feats):
        """feats -> scalar score (the pooling head of text_localisation.py:
        73-100). The cosine normalisation is differentiable; the pooling
        weights (argmax mask / max-norm / power) are stop-gradded."""
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        if feats.ndim == 3:  # attn-unpool [B, HW, D], per-location cosine
            logits = feats @ text_embedding  # [B, HW]
            if pool_cosine == 0:
                best = jnp.argmax(logits, axis=-1)
                mask = jax.nn.one_hot(best, logits.shape[-1], dtype=logits.dtype)
                logits = logits * jax.lax.stop_gradient(mask)
                # ref :95,100: mean over the (1, HW) row is the identity and
                # the final max rides over the masked locations
                return jnp.max(logits, axis=-1).sum()
            if norm_max_cosine:
                logits = logits / jax.lax.stop_gradient(
                    jnp.max(jnp.abs(logits), axis=-1, keepdims=True)
                )
            if pool_cosine > 1:
                logits = logits * jax.lax.stop_gradient(
                    jnp.abs(logits) ** (pool_cosine - 1)
                )
            return logits.mean(axis=-1).sum()
        return (feats @ text_embedding).sum()

    from bcosification_tpu.explain import fast_clip

    if fast_clip.supports(student):
        # hand-scheduled trunk backward (identical values/W, faster on TPU)
        feats, vjp_fn = fast_clip.fast_encode_and_vjp(student, student_vars, image)
        score, head_vjp = jax.vjp(head_fn, feats)
        (ct_feats,) = head_vjp(jnp.ones_like(score))
        grad = vjp_fn(ct_feats)
    else:
        score, grad = jax.value_and_grad(
            lambda x: head_fn(student.apply(student_vars, x, train=False, explain=True))
        )(image)
    contribs = (image * grad).sum(-1)[0]
    explanation = gradient_to_image(
        image[0], grad[0], smooth=smooth, alpha_percentile=alpha_percentile
    )
    # ref :122-124: symmetric percentile clip for the raw-attribution plot
    cutoff = jnp.percentile(jnp.abs(contribs), 99.5)
    clipped = jnp.clip(contribs, -cutoff, cutoff)
    return {
        "score": float(score),
        "dynamic_linear_weights": grad,
        "contribution_map": contribs,
        "contribution_map_clipped": clipped,
        "vrange": float(jnp.max(jnp.abs(clipped))),
        "explanation": explanation,
    }


class TextLocalisationAnalyser(Analyser):
    default_config = dict(
        pool_cosine=1, norm_max_cosine=False, smooth=0, alpha_percentile=99.5,
        templates=DEFAULT_TEMPLATES,
    )

    def __init__(self, student, student_vars, text_model, text_vars, **config):
        super().__init__(**config)
        self.student = student
        self.student_vars = student_vars
        self.text_model = text_model
        self.text_vars = text_vars

    def localise(self, image, phrase: str) -> Dict:
        emb = embed_phrase(
            self.text_model, self.text_vars, phrase, self.config["templates"]
        )
        return compute_attributions(
            self.student,
            self.student_vars,
            emb,
            image,
            pool_cosine=self.config["pool_cosine"],
            norm_max_cosine=self.config["norm_max_cosine"],
            smooth=self.config["smooth"],
            alpha_percentile=self.config["alpha_percentile"],
        )

    def analysis(self):
        raise NotImplementedError("use .localise(image, phrase) directly")


def argument_parser(add_help: bool = True):
    """Reference-compatible CLI (`/root/reference/interpretability/analyses/
    text_localisation.py:168-182`)."""
    import argparse

    parser = argparse.ArgumentParser(
        description="Text-grounded localisation for B-cosified CLIP.",
        add_help=add_help,
    )
    parser.add_argument("--exp_name", type=str, required=True,
                        help="experiment name under ImageNet/"
                             "clip_bcosification, or an experiment path")
    parser.add_argument("--text_to_localize", type=str, required=False,
                        help="comma-separated phrases")
    parser.add_argument("--exp_name_data", type=str, default=None,
                        help="accepted for reference parity (the datamodule "
                             "comes from the experiment config)")
    parser.add_argument("--image_index", type=int, default=11)
    parser.add_argument("--use_attn_unpool", action="store_true", default=False)
    parser.add_argument("--pool_cosine", type=int, default=1)
    parser.add_argument("--norm_max_cosine", action="store_true", default=False)
    parser.add_argument("--smooth", type=int, default=0)
    parser.add_argument("--random_img_path", type=str, default=None)
    parser.add_argument("--use_class_name", action="store_true", default=False)
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--reload", type=str, default="best_any")
    return parser


def _load_image(path: str):
    """PIL image -> [1,224,224,6] AddInverse tensor (the reference's eval
    transform: bicubic resize 224, center crop, ToTensor, AddInverse)."""
    from PIL import Image

    from bcosification_tpu.data import transforms as T

    tfm = T.Compose([
        T.Resize(224, interpolation="bicubic"),
        T.CenterCrop(224),
        T.ToFloatArray(),
        T.AddInverse(),
    ])
    with Image.open(path) as img:
        arr = tfm(img.convert("RGB"))
    return jnp.asarray(np.asarray(arr)[None])


def main(config=None):
    import os

    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from bcosification_tpu.clip.load import load as clip_load
    from bcosification_tpu.data.imagenet import imagenet_templates
    from bcosification_tpu.experiments.utils import Experiment

    if config is None:
        config = argument_parser().parse_args()

    if os.path.sep in config.exp_name and os.path.isdir(config.exp_name):
        experiment = Experiment(path=config.exp_name)
    else:
        experiment = Experiment("ImageNet", "clip_bcosification", config.exp_name)
    try:
        student, student_vars = experiment.load_trained_model(config.reload)
    except FileNotFoundError:
        print("No trained checkpoint; using conversion-time init")
        student, student_vars = experiment.get_model()
    # the text tower must match the student's CLIP architecture (embed dims
    # differ between RN50 and ViT towers) — same resolution as the trainer
    from bcosification_tpu.clip.load import MODEL_CONFIG_CLIP_NAMES

    model_cfg = experiment.config.get("model", {})
    clip_name = MODEL_CONFIG_CLIP_NAMES.get(
        model_cfg.get("name", "resnet50clip"), "RN50"
    )
    _, _, text_model, text_vars, _, _ = clip_load(clip_name)

    # attn-unpool is a MODEL property (built from model_config['attn_unpool']);
    # the flag cannot retrofit it — validate instead of silently diverging
    model_unpool = bool(model_cfg.get("attn_unpool", False))
    if config.use_attn_unpool and not model_unpool:
        raise ValueError(
            "--use_attn_unpool given but the experiment was not built with "
            "attn_unpool (model_config['attn_unpool'] is falsy)"
        )
    if model_unpool and not config.use_attn_unpool:
        print(
            "note: experiment uses attn_unpool; applying its cos_power "
            "(pass --use_attn_unpool --pool_cosine to override)"
        )
        config.use_attn_unpool = True
        config.pool_cosine = int(model_cfg.get("cos_power", config.pool_cosine))

    if config.random_img_path:
        image = _load_image(config.random_img_path)
        class_name = os.path.splitext(os.path.basename(config.random_img_path))[0]
    else:
        dm = experiment.get_datamodule()
        dm.setup("test")
        img_arr, label = dm.eval_dataset[config.image_index]
        image = jnp.asarray(np.asarray(img_arr)[None])
        if image.shape[-1] == 3:
            # CLIP eval presets stop at raw [0,1] 3-channel tensors (the
            # AddInverse encode happens model-side in training); the student
            # here takes AddInverse input directly
            image = jnp.concatenate([image, 1.0 - image], axis=-1)
        from bcosification_tpu.data.categories import imagenet_class_index

        class_name = imagenet_class_index()[str(int(label))][1]

    phrases = (
        [class_name]
        if config.use_class_name
        else [p.strip() for p in (config.text_to_localize or "").split(",") if p.strip()]
    )
    assert phrases, "give --text_to_localize or --use_class_name"

    analyser = TextLocalisationAnalyser(
        student, student_vars, text_model, text_vars,
        templates=imagenet_templates,
        pool_cosine=config.pool_cosine,
        norm_max_cosine=config.norm_max_cosine,
        smooth=config.smooth,
    )
    save_root = config.save_path or str(getattr(experiment, "save_dir", "."))
    out_dir = os.path.join(
        save_root, "textloc_expl", class_name, f"smooth{config.smooth}"
        + ("_attn_unpool" if config.use_attn_unpool else "")
    )
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for phrase in phrases:
        res = analyser.localise(image, phrase)
        # --smooth feeds the render's alpha channel inside the analyser
        # (ref :114-115); the raw-attribution map is percentile-clipped,
        # never smoothed (ref :121-124)
        np.savez(
            os.path.join(out_dir, f"Text_{phrase.replace(' ', '_')}.npz"),
            contribution_map=np.asarray(res["contribution_map_clipped"]),
            contribution_map_raw=np.asarray(res["contribution_map"]),
            vrange=np.asarray(res["vrange"]),
            explanation=np.asarray(res["explanation"]),
            score=np.asarray(res.get("score", np.nan)),
        )
        expl = np.asarray(res["explanation"])
        try:
            from PIL import Image as PILImage

            rgba = (np.nan_to_num(np.clip(expl, 0, 1)) * 255).astype(np.uint8)
            PILImage.fromarray(rgba, "RGBA").save(
                os.path.join(out_dir, f"Text_{phrase.replace(' ', '_')}.png")
            )
        except Exception:
            pass
        results[phrase] = res
    print(f"wrote {len(results)} text localisations to {out_dir}")
    return results


if __name__ == "__main__":
    main()

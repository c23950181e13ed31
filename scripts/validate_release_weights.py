#!/usr/bin/env python
"""Validate released checkpoints against the accuracy north stars.

BASELINE.md's real-weights targets (top-1 / zeroshot within 0.1% of the
released checkpoints) need actual weights + data, which zero-egress pods
don't have. This script is the one-command harness for the day they do:

    BCOS_WEIGHTS_DIR=/path/to/weights python scripts/validate_release_weights.py
        [--names resnet18,densenet121]      # default: every name with a file
        [--imagenet /path/to/imagenet]      # adds val top-1/top-5
        [--wds_root /path/to/wds/imagenet1k]  # adds the CLIP zeroshot leg
        [--clip_names <ckpt stems>]         # default: every CLIP-shaped .pth
        [--batch-size 64] [--limit N]       # eval knobs

For each registry entrypoint with `<name>.pth` (a released torch checkpoint,
ref pretrained.py URL table) or `<name>.npz` (already converted) in
$BCOS_WEIGHTS_DIR:

1. convert the .pth via bcosify.release_import (targeting the flax model
   flavour the checkpoint actually carries — `return_model=True`);
2. **fixed-tensor logit parity**: build the reference's own torch model for
   that entrypoint (`/root/reference/bcos/models/*.py` factories with the
   vit_final layer choices for ViTs), `load_state_dict` the SAME checkpoint,
   and compare logits on a fixed input — torch and the reference tree are
   in-process, so this needs no network and no labels;
3. with --imagenet: ImageNet-val top-1/top-5 of the converted checkpoint
   through the framework's own eval transform, to compare against the
   reference's published numbers (ref pretrained.py docstrings, e.g.
   resnet18 Acc@1 68.736%);
4. with --wds_root (skip-if-absent): the CLIP zeroshot leg — every trained
   B-cos CLIP visual .pth is converted and scored through the
   clip_benchmark zeroshot metric over local wds/imagenet1k shards, and
   (reference tree mounted) the reference's own torch model is scored on
   the SAME data with the SAME classifier; BASELINE's "within 0.1%"
   contract is asserted on the delta (`evaluate_clip_zeroshot`).

Exit code 0 iff every validated entrypoint passes parity. The tolerance is
an atol scaled by the largest reference logit (same shape as the in-repo
oracle, tests/test_release_import.py) — an element-wise relative error would
demand 1e-6 absolute agreement on near-sign-crossing logits, far tighter
than honest fp32 torch-vs-XLA drift over a 50-layer net.
tests/test_release_weights_validation.py runs the same checks under pytest,
skipping cleanly when no weights are present.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def build_reference_model(name: str, sd):
    """Instantiate the reference torch model an entrypoint's released
    checkpoint was saved from, and load the checkpoint into it.

    The norm flavour is detected from the checkpoint itself (running stats
    => BatchNormUncentered2d, else the family default position norm), the
    same rule release_import uses.
    """
    import torch
    import torch.nn as nn
    from functools import partial

    from reference_loader import load_reference, load_reference_from_scratch_models

    load_reference_from_scratch_models()
    mods = sys.modules["bcos.modules"]
    norms = sys.modules["bcos.modules.norms"]
    has_stats = any(k.endswith("running_var") for k in sd)
    bnu = norms.NoBias(norms.BatchNormUncentered2d)

    base = name[len("standard_"):] if name.startswith("standard_") else name
    base = base[: -len("_long")] if base.endswith("_long") else base
    kwargs = {}
    if base.startswith(("resnet", "resnext", "wide_resnet")):
        mod = load_reference("bcos.models.resnet")
        if has_stats:
            kwargs["norm_layer"] = bnu
        model = getattr(mod, base)(**kwargs)
    elif base.startswith("densenet"):
        mod = load_reference("bcos.models.densenet")
        if has_stats:
            kwargs["norm_layer"] = bnu
        model = getattr(mod, base)(**kwargs)
    elif base.startswith("vgg"):
        mod = load_reference("bcos.models.vgg")
        kwargs["conv_layer"] = mods.BcosConv2d
        if base.endswith("_bnu"):
            kwargs["norm_layer"] = bnu
        model = getattr(mod, base)(**kwargs)
    elif base.startswith("convnext"):
        mod = load_reference("bcos.models.convnext")
        arch = base[: -len("_bnu")] if base.endswith("_bnu") else base
        if base.endswith("_bnu") or has_stats:
            kwargs["norm_layer"] = bnu
        model = getattr(mod, arch)(**kwargs)
    elif base.startswith(("simple_vit", "vitc")):
        mod = load_reference("bcos.models.vit")
        common = load_reference("bcos.modules.common")
        logitmod = load_reference("bcos.modules.logitlayer")
        if name.startswith("standard_"):
            model = getattr(mod, base)(
                linear_layer=nn.Linear,
                conv2d_layer=nn.Conv2d,
                norm_layer=nn.LayerNorm,
                act_layer=nn.GELU,
                channels=3,
                norm2d_layer=norms.DetachableGNLayerNorm2d,
            )
        else:
            inner = getattr(mod, base)(
                linear_layer=partial(mods.BcosLinear, b=2, max_out=1),
                conv2d_layer=partial(mods.BcosConv2d, b=2, max_out=1),
                norm_layer=norms.NoBias(norms.DetachableLayerNorm),
                act_layer=nn.Identity,
                channels=6,
                norm2d_layer=norms.NoBias(norms.DetachableGNLayerNorm2d),
            )
            model = common.BcosSequential(
                inner, logitmod.LogitLayer(logit_bias=math.log(1 / 999))
            )
    else:
        raise ValueError(f"no reference builder for {name}")
    model.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    return model.eval()


def validate_logit_parity(
    name: str, weights_dir: Path, rtol: float = 1e-3, size: int = 224
):
    """Returns a details dict (keys: passed, pred_agree, errors). Raises if
    no weights file. ``size`` exists for the cheap synthetic-weights test
    (tests/test_validate_harness.py) — real released checkpoints always
    validate at the default 224."""
    import torch

    import jax.numpy as jnp
    from bcosification_tpu.bcosify.release_import import (
        convert_release_checkpoint,
        load_torch_state_dict,
    )

    pth = weights_dir / f"{name}.pth"
    npz = weights_dir / f"{name}.npz"
    if pth.exists():
        sd = load_torch_state_dict(pth)
    elif npz.exists():
        raise FileNotFoundError(
            f"{name}: only the converted npz is present — logit parity needs "
            f"the original .pth to drive the torch reference side"
        )
    else:
        raise FileNotFoundError(f"{name}: no weights in {weights_dir}")

    # return_model: the conversion may rebuild the norm flavour (BNU stats
    # under a posnorm-default name); comparing its variables under the
    # DEFAULT flax model would run the wrong norm math and false-FAIL.
    net, variables = convert_release_checkpoint(name, sd, return_model=True)
    ref = build_reference_model(name, sd)

    # all released models evaluate at 224x224 (vit_final test_transform crop
    # 224; the vitc "patch1_14" names describe the POST-stem 14x14 grid)
    channels = 3 if name.startswith("standard_") else 6
    rng = np.random.default_rng(0)
    x = rng.random((2, channels, size, size)).astype(np.float32)
    if channels == 6:
        x[:, 3:] = 1.0 - x[:, :3]  # AddInverse encoding
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = max(float(np.abs(want).max()), 1.0)
    abs_err = float(np.abs(got - want).max())
    details = {
        "max_abs_err": abs_err,
        "max_scaled_err": abs_err / scale,
        "logit_scale": scale,
        "pred_agree": bool((got.argmax(-1) == want.argmax(-1)).all()),
        "passed": bool(abs_err <= rtol * scale),
    }
    return details


def evaluate_imagenet(name: str, weights_dir: Path, imagenet: Path, batch_size: int,
                      limit: int = 0, crop_size: int = 224):
    """val top-1/top-5 of the CONVERTED released checkpoint through the
    framework's own eval pipeline.

    Converts straight from `<weights_dir>/<name>.pth` rather than going
    through ``load_model(pretrained=True)`` — that path resolves only a
    cached npz, so with the documented .pth-only weights dir it would warn
    and silently score a random-init model."""
    import jax
    import jax.numpy as jnp
    from bcosification_tpu.bcosify.release_import import convert_release_checkpoint
    from bcosification_tpu.data.datamodules import ImageNetDataModule
    from bcosification_tpu.data.presets import ImageNetClassificationPresetEval

    os.environ.setdefault("IMAGENET_PATH", str(imagenet))
    net, variables = convert_release_checkpoint(
        name, weights_dir / f"{name}.pth", return_model=True
    )
    is_bcos = not name.startswith("standard_")
    dm = ImageNetDataModule(
        dict(
            batch_size=batch_size,
            data_root=str(imagenet),
            train_transform=None,
            test_transform=ImageNetClassificationPresetEval(
                crop_size=crop_size, is_bcos=is_bcos
            ),
        )
    )
    dm.setup("test")

    @jax.jit
    def forward(x):
        return net.apply(variables, x)

    top1 = top5 = n = 0
    # eval loaders yield {"image", "label"} dict batches (NHWC), same
    # contract as evaluate.py / Trainer.validate
    for batch in dm.val_dataloader():
        logits = np.asarray(forward(jnp.asarray(batch["image"])))
        y = np.asarray(batch["label"])
        order = np.argsort(-logits, axis=-1)[:, :5]
        top1 += int((order[:, 0] == y).sum())
        top5 += int((order == y[:, None]).any(-1).sum())
        n += len(y)
        if limit and n >= limit:
            break
    return {"top1": top1 / n, "top5": top5 / n, "n": n}


def _build_reference_clip_student(sd, cfg):
    """Instantiate the reference's own BcosifyNetwork(ModifiedResNet) for a
    trained B-cos CLIP checkpoint and load the SAME state dict into it
    (ref `/root/reference/bcosify.py:74-114` conversion +
    `clip_bcosification/model.py:8-25` nulling pass)."""
    import importlib

    import torch

    from reference_loader import load_reference_bcosify

    ref_bcosify = load_reference_bcosify()
    clip_mod = importlib.import_module("CLIP.clip.model")
    visual = clip_mod.ModifiedResNet(
        layers=list(cfg["vision_layers"]),
        output_dim=cfg["embed_dim"],
        heads=cfg["vision_width"] * 32 // 64,
        input_resolution=cfg["image_resolution"],
        width=cfg["vision_width"],
    ).float()
    model_config = {
        "weights": "VALIDATE",
        "bcosify_args": {
            "fix_b": True, "use_bias": cfg["use_bias"], "norm_layer": "BnUncV2",
            "gap": True, "act_layer": True, "clip_kd": True,
        },
        "bcos_args": {"b": 2},
        "attn_unpool": cfg["attn_unpool"],
        "is_bcos": True,
    }
    ref = ref_bcosify.BcosifyNetwork(
        visual, model_config, add_channels=True, logit_layer=False
    )
    # the clip factory's nulling pass (clip_bcosification/model.py:17-24)
    for mod in ref.modules():
        if hasattr(mod, "bias") and mod.bias is not None and not cfg["use_bias"]:
            mod.bias = None
        if getattr(mod, "positional_embedding", None) is not None:
            mod.positional_embedding = None
    ref.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()})
    return ref.eval()


def evaluate_clip_zeroshot(
    ckpt_path: Path,
    wds_root: Path,
    batch_size: int = 64,
    limit: int = 0,
    with_reference: bool = True,
):
    """Zeroshot leg — BASELINE.md's third accuracy contract ("zeroshot
    within 0.1% via the CLIP_benchmark CLI").

    Converts a trained B-cos CLIP visual checkpoint
    (bcosify.clip_import.clip_trained_student_to_variables) and scores it
    through the clip_benchmark zeroshot metric (the same
    `zeroshot_classification.evaluate` the CLI's zeroshot task dispatches
    to — ref `/root/reference/CLIP_benchmark/clip_benchmark/cli.py:305-406`,
    `metrics/zeroshot_classification.py:184`) over local `wds/imagenet1k`
    shards. When the reference tree is mounted, the reference's OWN torch
    model loads the SAME checkpoint and is scored on the SAME data with the
    SAME prompt-ensembled classifier, so the comparison isolates the visual
    tower (`delta_vs_reference`). Absolute zeroshot numbers additionally
    need the real OpenAI RN50 text weights (CLIP_WEIGHTS_DIR /
    BCOS_ALLOW_DOWNLOAD); with a random-init text tower the torch-vs-flax
    delta is still exact but the absolute acc1 is flagged meaningless.
    """
    import jax
    import jax.numpy as jnp

    import importlib

    clip_load_mod = importlib.import_module("bcosification_tpu.clip.load")
    from bcosification_tpu.bcosify.clip_import import (
        build_bcosified_clip_visual,
        build_clip_text,
        clip_trained_student_to_variables,
        infer_clip_student_config,
    )
    from bcosification_tpu.bcosify.release_import import load_torch_state_dict
    from bcosification_tpu.clip.tokenizer import tokenize
    from clip_benchmark.datasets.builder import build_dataset
    from clip_benchmark.metrics import zeroshot_classification
    from clip_benchmark.models import ModelBundle, _addinverse_transform

    sd = load_torch_state_dict(ckpt_path)
    if "model.conv1.linear.weight" not in sd:
        raise ValueError(
            f"{ckpt_path}: not a trained B-cos CLIP visual checkpoint "
            "(missing model.conv1.linear.weight)"
        )
    cfg = infer_clip_student_config(sd)
    model_config = {
        "bcosify_args": {"use_bias": cfg["use_bias"]},
        "bcos_args": {"b": 2},
        "attn_unpool": cfg["attn_unpool"],
    }
    vision_cfg = {
        "vision_layers": cfg["vision_layers"],
        "vision_width": cfg["vision_width"],
        "embed_dim": cfg["embed_dim"],
        "image_resolution": cfg["image_resolution"],
    }
    net, variables = build_bcosified_clip_visual(model_config, None, vision_cfg)
    variables = clip_trained_student_to_variables(variables, sd)

    text_sd = clip_load_mod.load_state_dict_file("RN50")
    if text_sd is not None and int(text_sd["text_projection"].shape[-1]) != int(
        cfg["embed_dim"]
    ):
        import warnings

        warnings.warn(
            f"RN50 text tower embed dim {text_sd['text_projection'].shape[-1]} "
            f"!= visual embed dim {cfg['embed_dim']}; using a random-init "
            "tower of matching width (delta_vs_reference stays exact)"
        )
        text_sd = None
    if text_sd is None:
        from bcosification_tpu.clip.model import clip_rn50_config

        tcfg = dict(clip_rn50_config())
        tcfg["embed_dim"] = int(cfg["embed_dim"])
        text_model, text_vars = build_clip_text(None, tcfg)
    else:
        text_model, text_vars = build_clip_text(text_sd)
    cos_power = 1 if cfg["attn_unpool"] else 0

    def encode_image(images):
        return net.apply(variables, images, train=False)

    bundle = ModelBundle(encode_image, text_model, text_vars, tokenize, cos_power)

    ds = build_dataset(
        "wds/imagenet1k", root=str(wds_root), transform=_addinverse_transform()
    )
    if limit:
        ds.samples = ds.samples[:limit]
    from bcosification_tpu.data.imagenet import imagenet_classes, imagenet_templates
    from bcosification_tpu.data.loader import DataLoader

    classes = ds.classes or imagenet_classes()
    templates = ds.templates or imagenet_templates()
    loader = DataLoader(ds, batch_size, num_workers=2)

    classifier = zeroshot_classification.zero_shot_classifier(
        bundle, classes, templates
    )
    logits, target = zeroshot_classification.run_classification(
        bundle, classifier, loader, cos_power
    )
    acc1, acc5 = zeroshot_classification.accuracy(logits, target, topk=(1, 5))
    out = {
        "zeroshot_acc1": acc1,
        "zeroshot_acc5": acc5,
        "n": int(len(target)),
        "attn_unpool": cfg["attn_unpool"],
        "text_tower": "pretrained" if text_sd is not None else
        "RANDOM-INIT (absolute numbers meaningless; delta still exact)",
    }

    if with_reference:
        try:
            from reference_loader import reference_available

            if not reference_available():
                raise RuntimeError("reference tree not mounted")
            import torch

            ref = _build_reference_clip_student(sd, cfg)
            preds = []
            targets = []
            w = np.asarray(classifier)
            for images, ys in DataLoader(ds, batch_size, num_workers=2):
                x = torch.from_numpy(
                    np.asarray(images, np.float32).transpose(0, 3, 1, 2)
                )
                with torch.no_grad():
                    feats = ref(x).numpy()
                if feats.ndim == 3:  # unpool: per-location features
                    from bcosification_tpu.training.zeroshot import (
                        zeroshot_predict_logits,
                    )

                    lg = np.asarray(
                        zeroshot_predict_logits(
                            jnp.asarray(feats), jnp.asarray(w), cos_power
                        )
                    )
                else:
                    fn = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
                    lg = 100.0 * fn @ w
                preds.append(lg)
                targets.append(np.asarray(ys))
            ref_logits = np.concatenate(preds)
            ref_target = np.concatenate(targets)
            ref_acc1, _ = zeroshot_classification.accuracy(
                ref_logits, ref_target, topk=(1, 5)
            )
            out["reference_acc1"] = ref_acc1
            out["delta_vs_reference"] = acc1 - ref_acc1
            out["zeroshot_within_0p1"] = bool(abs(acc1 - ref_acc1) <= 1e-3)
        except Exception as e:  # noqa: BLE001 — reference side is best-effort
            out["reference_error"] = f"{type(e).__name__}: {e}"
    return out


def _looks_like_clip_student(pth: Path) -> bool:
    """Cheap key probe: a trained B-cos CLIP visual checkpoint carries
    model.conv1.linear.weight (BcosifyNetwork(ModifiedResNet) layout)."""
    try:
        from bcosification_tpu.bcosify.release_import import load_torch_state_dict

        return "model.conv1.linear.weight" in load_torch_state_dict(pth)
    except Exception:  # noqa: BLE001 — unreadable files just aren't CLIP
        return False


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights_dir", default=os.getenv("BCOS_WEIGHTS_DIR"))
    parser.add_argument("--names", default=None, help="comma-separated subset")
    parser.add_argument("--imagenet", default=os.getenv("IMAGENET_PATH"))
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--limit", type=int, default=0, help="cap on eval images")
    parser.add_argument("--rtol", type=float, default=1e-3)
    parser.add_argument(
        "--wds_root",
        default=os.getenv("WDS_IMAGENET1K_PATH"),
        help="local wds/imagenet1k shards for the CLIP zeroshot leg "
        "(skipped when absent)",
    )
    parser.add_argument(
        "--clip_names",
        default=None,
        help="comma-separated trained B-cos CLIP checkpoint stems in "
        "--weights_dir (default: every *.pth whose state dict carries "
        "model.conv1.weight, i.e. a trained CLIP visual)",
    )
    args = parser.parse_args(argv)

    if not args.weights_dir:
        parser.error("set --weights_dir or $BCOS_WEIGHTS_DIR")
    weights_dir = Path(args.weights_dir)

    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # BCOS_PLATFORM={cpu,tpu,auto} honoured

    from bcosification_tpu.models import pretrained as pretrained_lib

    if args.names:
        names = args.names.split(",")
    else:
        names = [
            n
            for n in pretrained_lib.list_available()
            if (weights_dir / f"{n}.pth").exists()
        ]

    # --- CLIP zeroshot leg (BASELINE third contract), skip-if-absent -------
    # "skip-if-absent" applies to AUTO-DISCOVERY only: an explicit
    # --clip_names with no usable --wds_root is an error, never a silent
    # pass (r5 review #2 — the old code printed "N CLIP checkpoints pass
    # zeroshot" for checkpoints that were never scored).
    clip_failures = []
    clip_names = args.clip_names.split(",") if args.clip_names else []
    if clip_names and not (args.wds_root and Path(args.wds_root).exists()):
        print(
            f"--clip_names given but wds_root "
            f"{args.wds_root or '(unset)'} is missing; cannot run the "
            f"zeroshot contract for {clip_names}",
            file=sys.stderr,
        )
        return 1
    if args.wds_root and Path(args.wds_root).exists():
        if not clip_names:
            # registry stems are the CNN/ViT release checkpoints the parity
            # loop already covers — don't torch.load hundreds of MB apiece a
            # second time just to learn they aren't CLIP (r5 review #5)
            registry_stems = set(pretrained_lib.list_available())
            clip_names = [
                p.stem
                for p in sorted(weights_dir.glob("*.pth"))
                if p.stem not in registry_stems and _looks_like_clip_student(p)
            ]
        for cname in clip_names:
            try:
                details = evaluate_clip_zeroshot(
                    weights_dir / f"{cname}.pth",
                    Path(args.wds_root),
                    args.batch_size,
                    args.limit,
                )
            except Exception as e:  # noqa: BLE001 — report and continue
                details = {"error": f"{type(e).__name__}: {e}"}
            print(json.dumps({"name": cname, "task": "zeroshot", **details}))
            if "error" in details or details.get("zeroshot_within_0p1") is False:
                clip_failures.append(cname)
    elif args.wds_root:
        print(f"wds_root {args.wds_root} not found; zeroshot leg skipped")

    if not names and not clip_names:
        print(f"no .pth checkpoints in {weights_dir}; nothing to validate")
        return 0

    failures = []
    for name in names:
        try:
            details = validate_logit_parity(name, weights_dir, rtol=args.rtol)
        except Exception as e:  # noqa: BLE001 — report and continue
            details = {"error": f"{type(e).__name__}: {e}", "passed": False}
        if args.imagenet and details.get("passed"):
            try:
                details["imagenet"] = evaluate_imagenet(
                    name, weights_dir, Path(args.imagenet), args.batch_size,
                    args.limit,
                )
            except Exception as e:  # noqa: BLE001
                details["imagenet"] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({"name": name, **details}))
        if not details.get("passed"):
            failures.append(name)

    if failures or clip_failures:
        print(f"FAILED: {failures + clip_failures}", file=sys.stderr)
        return 1
    print(f"all {len(names)} entrypoints pass logit parity (rtol {args.rtol})"
          + (f"; {len(clip_names)} CLIP checkpoints pass zeroshot"
             if clip_names else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())

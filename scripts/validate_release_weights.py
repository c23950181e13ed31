#!/usr/bin/env python
"""Validate released checkpoints against the accuracy north stars.

BASELINE.md's real-weights targets (top-1 / zeroshot within 0.1% of the
released checkpoints) need actual weights + data, which zero-egress pods
don't have. This script is the one-command harness for the day they do:

    BCOS_WEIGHTS_DIR=/path/to/weights python scripts/validate_release_weights.py
        [--names resnet18,densenet121]      # default: every name with a file
        [--imagenet /path/to/imagenet]      # adds val top-1/top-5
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
   resnet18 Acc@1 68.736%).

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


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights_dir", default=os.getenv("BCOS_WEIGHTS_DIR"))
    parser.add_argument("--names", default=None, help="comma-separated subset")
    parser.add_argument("--imagenet", default=os.getenv("IMAGENET_PATH"))
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--limit", type=int, default=0, help="cap on eval images")
    parser.add_argument("--rtol", type=float, default=1e-3)
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
    if not names:
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

    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        return 1
    print(f"all {len(names)} entrypoints pass logit parity (rtol {args.rtol})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

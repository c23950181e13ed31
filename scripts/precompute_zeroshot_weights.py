#!/usr/bin/env python
"""Precompute the ImageNet zeroshot classifier matrix from a CLIP text tower.

The reference assumes this matrix exists at IMAGENET_RN50_ZEROSHOT_WEIGHTS_PATH
(`/root/reference/bcos/training/trainer.py:47-48`) but ships no tool to build
it; this is that tool. Output: a .npy [D, 1000] consumed by the per-epoch
ImageNet ZeroshotEval and loadable via
`bcosification_tpu.training.zeroshot.load_zeroshot_weights`.

Usage:
  python scripts/precompute_zeroshot_weights.py --out imagenet_rn50_zs.npy \
      [--clip-weights /path/to/RN50.pt]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output .npy path")
    ap.add_argument(
        "--clip-weights",
        default=None,
        help="OpenAI CLIP RN50 checkpoint (defaults to settings.CLIP_WEIGHTS_PATH)",
    )
    ap.add_argument("--batch-classes", type=int, default=32)
    args = ap.parse_args(argv)

    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor BCOS_PLATFORM before the text tower runs

    from bcosification_tpu import settings
    from bcosification_tpu.clip import load as clip_load
    from bcosification_tpu.data.imagenet import imagenet_classes, imagenet_templates
    from bcosification_tpu.training import zeroshot as zs_lib

    import os

    if args.clip_weights:
        os.environ["CLIP_WEIGHTS_PATH"] = args.clip_weights
    # resolve through ALL of clip.load's sources (CLIP_WEIGHTS_PATH/DIR, the
    # local download cache, the BCOS_ALLOW_DOWNLOAD fetch) — the old guard
    # rejected valid configs that only set CLIP_WEIGHTS_DIR or the gate
    # (r5 review). A random-init text tower would produce garbage weights.
    if clip_load.load_state_dict_file("RN50") is None:
        ap.error(
            "no CLIP RN50 weights found: set --clip-weights / "
            "CLIP_WEIGHTS_PATH / CLIP_WEIGHTS_DIR, or BCOS_ALLOW_DOWNLOAD=1 "
            "on an egress-capable host"
        )
    _, _, text_model, text_vars, _, _ = clip_load.load("RN50", pretrained=True)
    w = zs_lib.zeroshot_classifier(
        text_model,
        text_vars,
        imagenet_classes,
        imagenet_templates,
        batch_classes=args.batch_classes,
    )
    zs_lib.save_zeroshot_weights(args.out, w)
    print(f"saved [{w.shape[0]}, {w.shape[1]}] zeroshot weights -> {args.out}")


if __name__ == "__main__":
    main()

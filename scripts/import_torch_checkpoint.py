#!/usr/bin/env python
"""Convert a torch checkpoint (.pth) into the weights-registry npz format.

Completes the released-weights story of `bcosification_tpu/models/pretrained.py`
(parity: ref `bcos/models/pretrained.py:119-125`, which torch.hub-downloads
URLS entries): on zero-egress TPU pods you download the .pth elsewhere, run
this tool, and point $BCOS_WEIGHTS_DIR at the output.

npz schema (the registry format, also produced by scripts/strip_checkpoints.py):
  keys   'params/<module path.../param>' and 'batch_stats/<...>' with '/'
         joining the flax tree path,
  values numpy arrays in THIS framework's layouts (conv HWIO, linear (in,out)),
  file   <entrypoint>[-<sha256-8>].npz, loaded by models.pretrained.load_model
         via BCOS_WEIGHTS_DIR/<entrypoint>.npz.

Supported sources:
  torchvision  a torchvision-architecture state_dict (the bcosification
               pipeline's starting point): converted through the bcosify
               importers (channel doubling, BN bias fold per the experiment's
               bcosify_args).
PL ('model.' / 'ema.module.') prefixes are stripped first, like the
reference's strip_checkpoints.py:50-87.
"""
from __future__ import annotations

import argparse
import hashlib
from pathlib import Path

import numpy as np


def load_torch_state_dict(path: str, use_ema: bool = False) -> dict:
    """.pth -> flat {name: np.ndarray}, ONE weight set selected by prefix.

    A PL checkpoint can hold BOTH model.* and ema.module.* sets; the
    reference's strip_checkpoints.py selects exactly one by prefix filter
    (`if key.startswith(prefix)`). Merging them (the old behavior) let dict
    iteration order decide which copy won (r5 review). ``use_ema`` picks the
    EMA set; nested wrappers (ema.module.model.*) are stripped fully."""
    import torch
    import warnings

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]

    def strip_wrappers(k: str) -> str:
        changed = True
        while changed:
            changed = False
            for p in ("model.", "module."):
                if k.startswith(p):
                    k = k[len(p):]
                    changed = True
        return k

    want = "ema.module." if use_ema else "model."
    other = "model." if use_ema else "ema.module."
    keys = list(obj)
    if any(k.startswith(want) for k in keys):
        return {
            strip_wrappers(k[len(want):]): v
            for k, v in obj.items()
            if k.startswith(want)
        }
    if any(k.startswith(other) for k in keys):
        warnings.warn(
            f"checkpoint has no {want}* keys; using the {other}* weight set"
        )
        return {
            strip_wrappers(k[len(other):]): v
            for k, v in obj.items()
            if k.startswith(other)
        }
    return {strip_wrappers(k): v for k, v in obj.items()}


def convert(state_dict, dataset, base_network, experiment_name):
    """-> (model, variables) in this framework's layout, converting the
    provided state_dict through the experiment's bcosify recipe (instead of
    the torchvision weights the experiment factory would load itself)."""
    from bcosification_tpu.bcosify.engine import (
        build_bcosified_densenet,
        build_bcosified_resnet,
    )
    from bcosification_tpu.experiments.utils import Experiment

    experiment = Experiment(dataset, base_network, experiment_name)
    mc = experiment.model_config
    arch = mc["name"]
    num_classes = mc.get("args", {}).get("num_classes", 1000)
    if arch.startswith(("resnet", "resnext", "wide_resnet")):
        return build_bcosified_resnet(mc, state_dict, num_classes=num_classes)
    if arch.startswith("densenet"):
        return build_bcosified_densenet(mc, state_dict, num_classes=num_classes)
    raise ValueError(
        f"unsupported arch {arch!r} — resnet/resnext/densenet checkpoints "
        "convert; ViTs train from scratch in the reference recipe"
    )


def flatten_variables(variables) -> dict:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def write_npz(variables, out_dir: Path, name: str, sha_suffix: bool = True) -> Path:
    out_dir.mkdir(parents=True, exist_ok=True)
    # np.savez appends '.npz' to names that lack it, so the tmp name must
    # already end in .npz
    tmp = out_dir / f"{name}.tmp.npz"
    np.savez(tmp, **flatten_variables(variables))
    if sha_suffix:
        sha = hashlib.sha256(tmp.read_bytes()).hexdigest()[:8]
        final = out_dir / f"{name}-{sha}.npz"
    else:
        final = out_dir / f"{name}.npz"
    tmp.rename(final)
    return final


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help=".pth file")
    parser.add_argument("--dataset", default="ImageNet")
    parser.add_argument("--base_network", default="bcosification")
    parser.add_argument("--experiment_name", required=True)
    parser.add_argument("--entrypoint", default=None,
                        help="registry name for the npz (default: experiment_name)")
    parser.add_argument("--output_dir", default="weights")
    parser.add_argument("--no-sha", action="store_true")
    parser.add_argument("--ema", action="store_true",
                        help="export the ema.module.* weight set")
    args = parser.parse_args()

    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # BCOS_PLATFORM={cpu,tpu,auto} honoured (CLAUDE.md)

    sd = load_torch_state_dict(args.checkpoint, use_ema=args.ema)
    model, variables = convert(
        sd, args.dataset, args.base_network, args.experiment_name
    )
    path = write_npz(
        variables, Path(args.output_dir), args.entrypoint or args.experiment_name,
        sha_suffix=not args.no_sha,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

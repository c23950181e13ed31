#!/usr/bin/env python
"""Export a training checkpoint to a bare, sha-stamped weights file.

Parity target: `/root/reference/scripts/strip_checkpoints.py:50-87` (PL ckpt ->
bare state_dict with 'model.'/'ema.module.' prefix stripping and a sha256
filename suffix). Here: orbax train-state -> flat npz of
{'params/...','batch_stats/...'} arrays, optionally the EMA weights.
"""
from __future__ import annotations

import argparse
import hashlib
from pathlib import Path

import numpy as np

import jax


def flatten_variables(variables) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="ImageNet")
    parser.add_argument("--base_network", default="bcosification")
    parser.add_argument("--experiment_name", required=True)
    parser.add_argument("--reload", default="best_any")
    parser.add_argument("--ema", action="store_true", help="export EMA weights")
    parser.add_argument("--output_dir", default="weights")
    args = parser.parse_args()

    from bcosification_tpu.experiments.utils import Experiment

    experiment = Experiment(args.dataset, args.base_network, args.experiment_name)
    model, variables = experiment.load_trained_model(args.reload, ema=args.ema)

    flat = flatten_variables(variables)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # np.savez appends '.npz' to names that lack it -> tmp must end in .npz
    tmp = out_dir / f"{args.experiment_name}.tmp.npz"
    np.savez(tmp, **flat)
    sha = hashlib.sha256(tmp.read_bytes()).hexdigest()[:8]
    suffix = "_ema" if args.ema else ""
    final = out_dir / f"{args.experiment_name}{suffix}-{sha}.npz"
    tmp.rename(final)
    print(f"wrote {final} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()

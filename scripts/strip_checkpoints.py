#!/usr/bin/env python
"""Export a training checkpoint to a bare, sha-stamped weights file.

Parity target: `/root/reference/scripts/strip_checkpoints.py:50-87` (PL ckpt ->
bare state_dict with 'model.'/'ema.module.' prefix stripping and a sha256
filename suffix). Here: orbax train-state -> flat npz of
{'params/...','batch_stats/...'} arrays, optionally the EMA weights.

Output resolves via the registry either way: models/pretrained.py looks up
<name>.npz AND the sha-stamped <name>-<sha8>.npz form (pass --no-sha for the
bare filename).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="ImageNet")
    parser.add_argument("--base_network", default="bcosification")
    parser.add_argument("--experiment_name", required=True)
    parser.add_argument("--reload", default="best_any")
    parser.add_argument("--ema", action="store_true", help="export EMA weights")
    parser.add_argument("--no-sha", action="store_true")
    parser.add_argument("--output_dir", default="weights")
    args = parser.parse_args()

    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # BCOS_PLATFORM={cpu,tpu,auto} honoured (CLAUDE.md)

    from bcosification_tpu.experiments.utils import Experiment
    # one shared flatten/sha-stamped-npz writer (import_torch_checkpoint.py)
    from scripts.import_torch_checkpoint import write_npz

    experiment = Experiment(args.dataset, args.base_network, args.experiment_name)
    # strict_ema: --ema on a checkpoint trained without EMA must fail, not
    # silently export plain weights under an _ema-labelled release filename
    model, variables = experiment.load_trained_model(
        args.reload, ema=args.ema, strict_ema=True
    )

    suffix = "_ema" if args.ema else ""
    final = write_npz(
        variables,
        Path(args.output_dir),
        f"{args.experiment_name}{suffix}",
        sha_suffix=not args.no_sha,
    )
    print(f"wrote {final}")


if __name__ == "__main__":
    main()

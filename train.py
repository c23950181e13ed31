#!/usr/bin/env python
"""Training entry point.

Arg-compatible with the reference `/root/reference/train.py:10-160`
(--dataset/--base_network/--experiment_name plus debug/logging flags); flags
that are GPU/Lightning-specific (--distributed, --amp via precision plugin)
map to their TPU-native equivalents (the mesh always spans all local devices;
--amp selects the bf16 compute policy).
"""
import argparse
import os
import pdb
import sys
import traceback

if os.environ.get("JAX_PLATFORMS"):
    # The axon sitecustomize registers the TPU plugin in every python
    # process and sets jax_platforms="axon,cpu", silently overriding the
    # JAX_PLATFORMS env var. Restore the documented env-var semantics for
    # this entry point (tests/CPU runs rely on it; see CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from bcosification_tpu.experiments.utils.config_utils import (
    get_configs_and_model_factory,
)
from bcosification_tpu.training.trainer import run_training


def get_parser():
    parser = argparse.ArgumentParser(description="Start training.")
    parser.add_argument("--dataset", required=True, help="e.g. ImageNet, CIFAR10, CC3M")
    parser.add_argument("--base_network", required=True, help="e.g. bcosification")
    parser.add_argument("--experiment_name", required=True, help="e.g. resnet_18")
    parser.add_argument(
        "--distributed", action="store_true",
        help="accepted for CLI parity; the device mesh always spans all chips",
    )
    parser.add_argument("--amp", action="store_true", help="bf16 compute policy")
    parser.add_argument("--jit", action="store_true", help="always on under XLA")
    parser.add_argument(
        "--cache_dataset", choices=["onthefly", "shm", None], default=None
    )
    parser.add_argument("--csv_logger", action="store_true", default=True)
    parser.add_argument("--tensorboard_logger", action="store_true")
    parser.add_argument("--wandb_logger", action="store_true")
    parser.add_argument("--wandb_project", default=None)
    parser.add_argument("--wandb_id", default=None)
    parser.add_argument("--wandb_name", default=None)
    parser.add_argument(
        "--base_directory", default=None,
        help="root for experiment save dirs; unset -> BCOS_EXPERIMENT_ROOT "
        "env / settings default (reference train.py --base_directory)",
    )
    parser.add_argument(
        "--refresh_rate", type=int, default=None,
        help="progress print refresh rate (reference: progress-bar refresh)",
    )
    parser.add_argument("--explanation_logging", action="store_true")
    parser.add_argument("--explanation_logging_every_n_epochs", type=int, default=1)
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--track_grad_norm", action="store_true")
    parser.add_argument(
        "--fsdp", action="store_true",
        help="shard params/moments/EMA over the data axis (ZeRO-3; "
        "beyond-reference, docs/SCALING.md)",
    )
    parser.add_argument(
        "--model_parallel", type=int, default=1,
        help="Megatron TP degree over the 'model' mesh axis (beyond-reference)",
    )
    parser.add_argument(
        "--pipeline_parallel", type=int, default=1,
        help="GPipe stages for SimpleViT encoder stacks (beyond-reference; "
        "rides a dedicated 'pipe' mesh axis, composing with "
        "--model_parallel TP — docs/SCALING.md)",
    )
    parser.add_argument(
        "--log_every_n_steps", type=int, default=50,
        help="per-step train-loss/lr event logging cadence (PL default 50)",
    )
    parser.add_argument(
        "--profile_dir", default=None,
        help="capture a jax.profiler device trace of steps 3-8 of the first "
        "epoch into this directory (TensorBoard/XProf viewable)",
    )
    parser.add_argument(
        "--force-no-resume",
        dest="resume",
        default=True,  # resume by default, exactly like the reference
        action="store_false",
        help="do NOT auto-resume from the last checkpoint "
        "(reference train.py:40-46 — note the inverted dest)",
    )
    return parser


def _args_validation(args):
    configs, _ = get_configs_and_model_factory(args.dataset, args.base_network)
    if args.experiment_name not in configs:
        raise ValueError(
            f"Unknown experiment '{args.experiment_name}'. "
            f"Available: {sorted(configs)[:30]}"
        )


def main():
    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = get_parser().parse_args()
    _args_validation(args)
    if args.debug:
        try:
            run_training(args)
        except Exception:
            traceback.print_exc()
            pdb.post_mortem()
            sys.exit(1)
    else:
        run_training(args)


if __name__ == "__main__":
    main()

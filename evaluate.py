#!/usr/bin/env python
"""Deterministic evaluation entry point.

Arg-compatible with `/root/reference/evaluate.py`: loads a trained (or
freshly-bcosified) model via Experiment, runs the top-1/top-5 loop over the
test loader. XLA on TPU is deterministic for this inference graph (the
reference needs `torch.use_deterministic_algorithms(True)`, evaluate.py:74-75).
"""
import argparse
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    # see train.py: the axon sitecustomize overrides the env var
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from bcosification_tpu.experiments.utils.experiment_utils import Experiment
from bcosification_tpu.parallel import mesh as mesh_lib


def get_parser():
    parser = argparse.ArgumentParser(description="Evaluate a model.")
    parser.add_argument("--dataset", default="ImageNet")
    parser.add_argument("--base_network", default="bcosification")
    parser.add_argument("--experiment_name", required=True)
    parser.add_argument(
        "--reload", default="last",
        help="last | best | best_any | epoch_<N> | fresh (conversion-time init)",
    )
    parser.add_argument("--ema", action="store_true", help="use EMA weights")
    parser.add_argument("--weights", default=None, help="explicit .npz weights file")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument(
        "--no-cuda", "--no_cuda", dest="no_cuda", action="store_true",
        help="parity no-op (reference spells it --no-cuda)",
    )
    parser.add_argument(
        "--base_directory", default=None,
        help="root for experiment save dirs (reference evaluate.py arg)",
    )
    return parser


def load_model_and_config(args):
    if getattr(args, "base_directory", None):
        from bcosification_tpu import settings

        settings.EXPERIMENT_ROOT = args.base_directory
    experiment = Experiment(args.dataset, args.base_network, args.experiment_name)
    if args.weights:
        model, variables = experiment.get_model()
        from bcosification_tpu.bcosify.torch_import import variables_from_npz

        variables = variables_from_npz(args.weights, variables)
    elif args.reload == "fresh":
        # fresh bcosification from the pretrained checkpoint (evaluate.py:133-168)
        model, variables = experiment.get_model()
    else:
        model, variables = experiment.load_trained_model(args.reload, ema=args.ema)
    return experiment, model, variables


def evaluate(model, variables, loader, mesh):
    @jax.jit
    def step(variables, batch):
        out = model.apply(variables, batch["image"], train=False)
        label = batch["label"]
        label = label if label.ndim == 1 else jnp.argmax(label, -1)
        top5 = jax.lax.top_k(out, 5)[1]
        return (
            (jnp.argmax(out, -1) == label).sum(),
            jnp.any(top5 == label[:, None], -1).sum(),
        )

    variables = mesh_lib.replicate(variables, mesh)
    n = c1 = c5 = 0
    for batch in loader:
        batch = mesh_lib.shard_batch(batch, mesh)
        b1, b5 = step(variables, batch)
        c1 += int(b1)
        c5 += int(b5)
        n += int(batch["label"].shape[0])
        print(f"\r{n}: top1 {c1 / max(n,1):.4%} top5 {c5 / max(n,1):.4%}", end="")
    print()
    return c1 / max(n, 1), c5 / max(n, 1)


def run_evaluation(args):
    experiment, model, variables = load_model_and_config(args)
    datamodule = experiment.get_datamodule()
    if args.batch_size:
        datamodule.batch_size = args.batch_size
    datamodule.setup("test")
    mesh = mesh_lib.make_mesh()
    top1, top5 = evaluate(model, variables, datamodule.test_dataloader(), mesh)
    print(f"Final: top-1 {top1:.4%}, top-5 {top5:.4%}")
    return top1, top5


if __name__ == "__main__":
    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    run_evaluation(get_parser().parse_args())

#!/usr/bin/env python
"""Multi-host (TPU pod) launcher.

Replaces the reference's SLURM/submitit wrapper
(`/root/reference/run_with_submitit.py`): on a TPU pod each host runs this
same script; `jax.distributed.initialize()` wires the hosts into one JAX
process group (the TorchDistributedEnvironment().export() analogue,
run_with_submitit.py:40-42), the data mesh then spans every chip in the pod
and the train loop shards the global batch across hosts.

Preemption recovery (submitit auto-requeue, run_with_submitit.py:46-49) is
inherent: training always resumes from the last checkpoint, so the pod
scheduler can simply restart the job.

Usage (on every pod host):
    python run_distributed.py --dataset ImageNet --base_network bcosification \
        --experiment_name resnet_18
"""
import sys


def main():
    import jax

    try:
        jax.distributed.initialize()  # auto-detects TPU pod topology
        print(
            f"jax.distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    except Exception as e:  # single-host fallback
        print(f"single-host run ({e})")

    from train import main as train_main

    train_main()


if __name__ == "__main__":
    main()

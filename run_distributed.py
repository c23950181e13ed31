#!/usr/bin/env python
"""Multi-host (TPU pod) launcher.

Replaces the reference's SLURM/submitit wrapper
(`/root/reference/run_with_submitit.py`): on a TPU pod each host runs this
same script; `jax.distributed.initialize()` wires the hosts into one JAX
process group (the TorchDistributedEnvironment().export() analogue,
run_with_submitit.py:40-42), the data mesh then spans every chip in the pod
and the train loop shards the global batch across hosts. Only process 0
writes checkpoints/metrics/logs (parallel.mesh.is_main_process).

A failed `jax.distributed.initialize()` is FATAL by default: a mis-configured
pod silently training single-host is the worst failure mode (burns the whole
pod's quota producing a model nobody asked for). Pass --single-host-ok to
explicitly allow the single-host fallback for local/debug runs.

Preemption recovery (submitit auto-requeue, run_with_submitit.py:46-49) is
inherent: training always resumes from the last checkpoint, so the pod
scheduler can simply restart the job.

Usage (on every pod host):
    python run_distributed.py --dataset ImageNet --base_network bcosification \
        --experiment_name resnet_18
"""
import sys


def initialize_distributed(argv=None, _initialize=None):
    """Init the JAX process group; returns True if multi-host is live.

    Consumes --single-host-ok from argv (so train.py's parser never sees
    it). Raises RuntimeError on init failure unless that flag was passed.
    ``_initialize`` is injectable for tests.
    """
    argv = sys.argv if argv is None else argv
    single_host_ok = "--single-host-ok" in argv
    if single_host_ok:
        argv.remove("--single-host-ok")

    import os

    import jax

    init = _initialize or jax.distributed.initialize
    # torchrun/submitit-style env contract: the reference pod launcher
    # exports MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK via
    # TorchDistributedEnvironment().export() (run_with_submitit.py:40-42).
    # Honouring the same names lets non-TPU process groups (CPU pods, local
    # multi-process debug runs — tests/test_real_distributed.py) configure
    # the group explicitly where JAX's TPU-metadata auto-detection is absent.
    kwargs = {}
    env_contract = {k: os.environ.get(k) for k in ("MASTER_ADDR", "WORLD_SIZE", "RANK")}
    if all(env_contract.values()):
        try:
            kwargs = dict(
                coordinator_address=(
                    f"{env_contract['MASTER_ADDR']}:"
                    f"{os.environ.get('MASTER_PORT', '29500')}"
                ),
                num_processes=int(env_contract["WORLD_SIZE"]),
                process_id=int(env_contract["RANK"]),
            )
        except ValueError as e:
            # malformed numbers must reach the same warn-or-fallback path as
            # an init failure, not crash before --single-host-ok applies
            print(
                f"malformed WORLD_SIZE/RANK env contract ({e}); "
                "falling back to auto-detection"
            )
            kwargs = {}
    elif any(env_contract.values()):
        # partially-set contract (e.g. stale MASTER_ADDR from another
        # launcher): fall back to auto-detection rather than crashing on the
        # missing key or silently mis-joining a foreign group
        print(
            "ignoring partial MASTER_ADDR/WORLD_SIZE/RANK env contract "
            f"({ {k: v for k, v in env_contract.items() if v} }); "
            "set all three to configure the process group explicitly"
        )
    try:
        init(**kwargs)  # no kwargs: auto-detects TPU pod topology
    except Exception as e:
        if single_host_ok:
            print(f"single-host run (--single-host-ok; init failed: {e})")
            return False
        raise RuntimeError(
            "jax.distributed.initialize() failed — refusing to silently "
            "fall back to a single-host run on what may be a mis-configured "
            "pod. Pass --single-host-ok to allow the fallback for "
            f"local/debug runs. Original error: {e}"
        ) from e
    if kwargs and jax.process_count() != kwargs["num_processes"]:
        # the coordinator handshake succeeded but the BACKEND does not see
        # the group (measured failure mode: a platform plugin initialised
        # before/after the group claims process_count=1, every rank then
        # believes it is main and they concurrently write one experiment
        # dir). Select the platform BEFORE initialising (BCOS_PLATFORM /
        # apply_platform_env — main() does).
        raise RuntimeError(
            f"jax.distributed joined a {kwargs['num_processes']}-process "
            f"group but jax.process_count()={jax.process_count()} — the "
            "active platform plugin ignores the process group; set "
            "BCOS_PLATFORM (or initialise the intended backend) before "
            "initialize_distributed()"
        )
    print(
        f"jax.distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
    return jax.process_count() > 1


def main():
    # platform choice must precede distributed init: querying process/device
    # counts initialises the backend, and an eagerly-grabbed default platform
    # (the axon single-chip plugin here) reports process_count=1 regardless
    # of the joined group
    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    initialize_distributed()

    from train import main as train_main

    train_main()


if __name__ == "__main__":
    main()

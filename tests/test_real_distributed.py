"""REAL multi-process distributed run (no monkeypatching): two OS processes
form a `jax.distributed` group over Gloo on CPU and drive the actual
launcher + Trainer with `data.split_by_process`.

This is the only place the true multi-host seams execute for real:
`jax.make_array_from_process_local_data` with process_count==2, the
`_host_state` all-gather every process participates in before the
process-0-only checkpoint write, and restore-on-every-process from the
shared save_dir. (`dryrun_multichip` and tests/test_multihost_io.py cover
the same code paths single-process.)
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_real_two_process_distributed(tmp_path):
    port = _free_port()
    worker = REPO / "tests" / "real_distributed_worker.py"
    procs, logs = [], []
    for rank in range(2):
        env = dict(
            os.environ,
            MASTER_ADDR="localhost",
            MASTER_PORT=str(port),
            WORLD_SIZE="2",
            RANK=str(rank),
            # 2 virtual CPU devices per process -> a 4-device global mesh
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        # file-backed output, not PIPE: an undrained pipe blocks a chatty
        # worker at ~64 KB, which stalls its collectives and deadlocks BOTH
        # ranks until the timeout
        log = open(tmp_path / f"rank{rank}.log", "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(tmp_path)],
            env=env, cwd=str(REPO),
            stdout=log, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.flush()
            log.seek(0)
            outs.append(log.read())
            log.close()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # both ranks ran the same trajectory: param hashes / ring metrics
    # identical across processes at every stage
    stages = {}
    for rank, out in enumerate(outs):
        for line in out.splitlines():
            prefix = f"WORKER {rank} "
            if line.startswith(prefix):
                stage, _, rest = line[len(prefix):].partition(" ")
                stages.setdefault(stage, []).append(rest)
    assert set(stages) == {"FIT", "RESUME", "FSDP", "FSDPRESUME", "RING"}, stages
    assert {len(v) for v in stages.values()} == {2}, stages
    for stage, vals in stages.items():
        assert vals[0] == vals[1], (stage, stages)
    assert stages["FIT"][0].startswith("steps=8 ")  # 2 epochs x 4 steps
    assert stages["RESUME"][0].startswith("steps=12 ")  # +1 resumed epoch
    assert stages["FSDP"][0].startswith("steps=4 ")  # state sharded over ranks
    assert stages["FSDPRESUME"][0].startswith("steps=8 ")

    # process-0-only writes: metrics/checkpoints exist exactly once, index
    # valid with all three epochs
    import json

    exp_dir = tmp_path / "exp"
    assert (exp_dir / "metrics.csv").exists()
    index = json.loads((exp_dir / "checkpoints" / "index.json").read_text())
    assert sorted(index["epochs"]) == ["0", "1", "2"], index
    assert index["last"] == 2

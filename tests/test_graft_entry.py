"""The driver's entry points must keep working — especially dryrun_multichip,
which must run on the virtual-CPU mesh even under the axon sitecustomize
(round-1 regression: it silently targeted the TPU tunnel and failed)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__

    # conftest already forces jax_platforms=cpu with 8 virtual devices; the
    # function must also force this itself (idempotent here) and complete a
    # full sharded train step + SigLIP ring step.
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == (8, 1000)

"""Driver-contract tests: entry() compiles; dryrun_multichip(8) executes."""

import pytest

pytestmark = pytest.mark.slow

import sys

import jax
import numpy as np


def _load_entry():
    sys.path.insert(0, ".")
    import __graft_entry__

    return __graft_entry__


def test_entry_forward_compiles():
    mod = _load_entry()
    fn, (variables, scene) = mod.entry()
    head_outs, valid, rgb = jax.jit(fn)(variables, scene)
    assert len(head_outs) == 3
    assert np.isfinite(np.asarray(rgb)).all()


def test_dryrun_multichip_8():
    mod = _load_entry()
    assert len(jax.devices()) >= 8
    mod.dryrun_multichip(8)


def test_dryrun_multichip_driver_env():
    """Reproduce the DRIVER environment: JAX_PLATFORMS=axon, no CPU pin.

    Round 1's driver run crashed (rc=134, CPU all-gather rendezvous
    deadlock) because the dryrun shared a process with the live TPU
    platform. The fix spawns a CPU-pinned subprocess, so the call must
    succeed regardless of the caller's platform. This test calls the
    entry point from a fresh process whose env pins the axon platform —
    the exact condition conftest.py otherwise masks. No TPU traffic
    happens: dryrun_multichip spawns its child before importing jax.
    """
    import os
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env.pop("_NERFDET_DRYRUN_CHILD", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout={proc.stdout[-2000:]}\n"
        f"stderr={proc.stderr[-2000:]}")
    assert "dryrun_multichip(8): loss=" in proc.stdout

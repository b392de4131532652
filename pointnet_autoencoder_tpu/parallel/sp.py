"""Point (sequence) parallelism: Chamfer over clouds sharded along N.

The single-chip long-N strategy (docs/ARCHITECTURE.md: tiled Pallas
Chamfer at any N, dense past N=8192) tops out at what one chip can sweep;
this module scales the Chamfer *loss itself* across the mesh by sharding
the first cloud's point axis -- the TPU-native analog of a multi-GPU
nn_distance the reference never had (its CUDA op is single-device,
tf_nndistance_g.cu:5-127).

Decomposition (exact, not approximate):

* direction 1 (each x point -> nearest y): embarrassingly parallel over
  x shards with y replicated; each device runs the existing Pallas/XLA
  kernel on its slice.
* direction 2 (each y point -> nearest x): each device computes the
  nearest x *within its shard* for every y, then a pmin tree-reduce over
  the mesh picks the global winner. Ties break to the lowest global x
  index -- the unsharded kernel's first-min semantics, because shards are
  contiguous slices and each shard's local argmin is already its lowest
  attaining local index. Indices match the unsharded op exactly;
  distances can differ by 1 ulp (XLA fuses the shard-shaped pair sweep
  differently), the same deviation the unsharded kernel itself shows
  against the numpy oracle.

Gradients are exact: the per-shard calls carry the op's custom VJP, and
the direction-2 combine routes the cotangent to the winning shard through
a stop-gradient mask + psum (never through pmin, which has no transpose).

Intended use: clouds too large for one chip's sweep (N in the 10^5-10^6
range), dense-reconstruction evaluation, or squeezing latency by throwing
the whole mesh at one batch. Training at the reference workload shape
keeps plain data parallelism -- sharding N=2048 would just starve the
kernel tiles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnet_autoencoder_tpu.ops import chamfer
from pointnet_autoencoder_tpu.parallel.mesh import DATA_AXIS

_INT32_MAX = jnp.iinfo(jnp.int32).max


def _shard_body(x1, x2, *, axis: str, impl: Optional[str]):
    """Per-device body: x1 is the local (B, N/k, 3) slice, x2 replicated."""
    shard_n = x1.shape[1]
    # Mark the replicated cloud as device-varying before it enters the
    # kernel: its per-shard cotangents differ, and pvary is what tells
    # shard_map's transpose to psum them back to the replicated spec.
    x2 = jax.lax.pvary(x2, axis)
    d1, i1, d2_loc, i2_loc = chamfer.nn_distance(x1, x2, impl=impl)
    # Local x indices -> global (shards are contiguous slices of N).
    offset = jax.lax.axis_index(axis).astype(jnp.int32) * shard_n
    i2_glob = i2_loc + offset

    # Global min distance per y point, then the lowest global index among
    # the shards attaining it (first-min tie-break).
    d2_min = jax.lax.pmin(jax.lax.stop_gradient(d2_loc), axis)
    i2 = jax.lax.pmin(
        jnp.where(jax.lax.stop_gradient(d2_loc) == d2_min, i2_glob,
                  _INT32_MAX),
        axis,
    )
    # Differentiable global distance: exactly one shard holds the winning
    # index; psum of the masked local distances reproduces d2_min while
    # routing the cotangent to that shard alone.
    mask = jax.lax.stop_gradient(i2_glob == i2)
    d2 = jax.lax.psum(jnp.where(mask, d2_loc, 0.0), axis)
    return d1, i1, d2, i2


def nn_distance_point_sharded(xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh,
                              axis: str = DATA_AXIS,
                              impl: Optional[str] = None):
    """nn_distance with xyz1's point axis sharded over ``mesh[axis]``.

    Args:
      xyz1: (B, N, 3); N must divide by the mesh axis size. Sharded along
        N over ``axis`` (re-placed if it arrives with another sharding).
      xyz2: (B, M, 3); replicated.
      mesh: the device mesh; ``axis`` names the point-parallel dimension.
      impl: per-shard kernel choice, as ``ops.chamfer.nn_distance``.

    Returns the usual (dist1, idx1, dist2, idx2): dist1/idx1 sharded along
    N, dist2/idx2 replicated. Indices are exact vs the unsharded op
    (including first-min tie-breaks); distances match to 1 ulp (see module
    docstring). Differentiable in both clouds.
    """
    k = mesh.shape[axis]
    if xyz1.shape[1] % k != 0:
        raise ValueError(
            f"point axis N={xyz1.shape[1]} must divide by mesh "
            f"axis {axis!r} size {k}"
        )
    fn = jax.shard_map(
        partial(_shard_body, axis=axis, impl=impl),
        mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=(P(None, axis), P(None, axis), P(), P()),
    )
    xyz1 = jax.lax.with_sharding_constraint(
        xyz1.astype(jnp.float32), NamedSharding(mesh, P(None, axis, None)))
    xyz2 = jax.lax.with_sharding_constraint(
        xyz2.astype(jnp.float32), NamedSharding(mesh, P()))
    return fn(xyz1, xyz2)


def chamfer_loss_point_sharded(xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh,
                               axis: str = DATA_AXIS,
                               impl: Optional[str] = None) -> jax.Array:
    """mean(dist1) + mean(dist2) over the point-sharded op (the reference
    loss contract, models/model.py:77-83, at mesh scale)."""
    d1, _, d2, _ = nn_distance_point_sharded(xyz1, xyz2, mesh, axis=axis,
                                             impl=impl)
    return jnp.mean(d1) + jnp.mean(d2)

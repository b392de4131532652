"""Chamfer distance (nearest-neighbor distance) op, TPU-native.

Equivalent of the reference custom op ``nn_distance``
(tf_ops/nn_distance/tf_nndistance.cpp:3-18, CUDA kernel
tf_nndistance_g.cu:5-131) and its registered gradient
(tf_nndistance.py:31-37, CUDA tf_nndistance_g.cu:132-157), re-designed for
TPU:

- forward: for each point of one cloud, the *squared* L2 distance to (and the
  index of) its nearest neighbor in the other cloud, both directions.
  Two implementations:

  * ``impl="xla"``   - dense (B,N,M) distance matrix, XLA-fused broadcast.
  * ``impl="pallas"``- fused Pallas kernel that tiles the M axis with a
    running (min, argmin), never materializing (B,N,M) in HBM. This is the
    TPU analog of the reference CUDA kernel's 512-point shared-memory tiles.

- backward: jax.custom_vjp with the analytic gradient of
  ``min_j ||p_i - q_j||^2`` holding the argmin constant: per matched pair,
  ``g = 2 * grad_dist * (p - q)`` accumulates +g on the query point and -g
  (scatter-add) on its matched point, both directions -- exactly the
  contract of the reference NnDistanceGrad kernel.

The argmin tie-break is "first minimum wins" in both implementations,
matching the strict-< comparison chain of the CUDA kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_TILE_N = 512
_DEFAULT_TILE_M = 512
# Padding coordinate for remainder tiles: far enough that padded points never
# win an argmin against real data, small enough that its square is finite.
_PAD_COORD = 1e10


def _auto_impl() -> str:
    # NOTE: a matmul-identity (MXU) variant was evaluated and rejected:
    # Mosaic lowers the f32 cross-term dot to a single-pass bf16 matmul
    # (~1e-1 absolute d2 error, 10% argmin flips) and the K=3 contraction
    # wastes the systolic array -- the broadcast VPU kernel is 2.3x faster.
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# ---------------------------------------------------------------------------
# Dense XLA implementation
# ---------------------------------------------------------------------------


def _sqdist_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(B,N,3) x (B,M,3) -> (B,N,M) squared distances.

    Written as three fused outer differences (same arithmetic as the Pallas
    kernel and the reference CUDA kernel) rather than the |a|^2+|b|^2-2ab
    matmul form, so results agree bit-for-bit across impls.
    """
    d2 = jnp.zeros(a.shape[:-2] + (a.shape[-2], b.shape[-2]), a.dtype)
    for c in range(a.shape[-1]):
        diff = a[..., :, None, c] - b[..., None, :, c]
        d2 = d2 + diff * diff
    return d2


def _nn_distance_xla(xyz1, xyz2):
    d2 = _sqdist_matrix(xyz1, xyz2)  # (B,N,M)
    dist1 = jnp.min(d2, axis=2)
    idx1 = jnp.argmin(d2, axis=2).astype(jnp.int32)
    dist2 = jnp.min(d2, axis=1)
    idx2 = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2


# ---------------------------------------------------------------------------
# Pallas implementation
# ---------------------------------------------------------------------------


def _nn_direction_kernel(x1t_ref, x2_ref, dist_ref, idx_ref, *, tile_m: int):
    """One direction of nn_distance for one (batch, N-tile, M-tile) cell.

    x1t_ref: (1, 3, TN) query points, coordinate-major (lane-packed).
    x2_ref:  (1, TM, 3) search-cloud tile, delivered by the M grid dim so
             VMEM holds one tile at a time (a full (M, 3) block lane-pads
             3 -> 128 and OOMs VMEM around M~16k).
    dist_ref/idx_ref: (1, 1, TN); their index map ignores the M grid dim,
             so they act as running (min, argmin) accumulators across the
             sequentially-iterated M tiles.

    d2 is oriented (TM, TN): the reduction runs over sublanes, where
    Mosaic's min+argmin is ~3.5x faster than the lane-axis form. This is
    the TPU analog of the reference CUDA kernel's shared-memory chunking
    (tf_nndistance_g.cu:6-13) with no HBM (N,M) intermediate.
    """
    mt = pl.program_id(2)
    ax = x1t_ref[0, 0:1, :]  # (1, TN)
    ay = x1t_ref[0, 1:2, :]
    az = x1t_ref[0, 2:3, :]
    tn = ax.shape[1]

    @pl.when(mt == 0)
    def _init():
        dist_ref[0] = jnp.full((1, tn), jnp.inf, dtype=x1t_ref.dtype)
        idx_ref[0] = jnp.zeros((1, tn), dtype=jnp.int32)

    bx = x2_ref[0, :, 0:1]  # (TM, 1)
    by = x2_ref[0, :, 1:2]
    bz = x2_ref[0, :, 2:3]
    dx = bx - ax  # (TM, TN)
    dy = by - ay
    dz = bz - az
    d2 = dx * dx + dy * dy + dz * dz
    tile_min = jnp.min(d2, axis=0, keepdims=True)  # (1, TN)
    tile_arg = (jnp.argmin(d2, axis=0).reshape(1, tn).astype(jnp.int32)
                + mt * tile_m)
    run_min = dist_ref[0]
    take = tile_min < run_min  # strict <: earlier M tile wins ties
    dist_ref[0] = jnp.where(take, tile_min, run_min)
    idx_ref[0] = jnp.where(take, tile_arg, idx_ref[0])


def _pad_points(x, multiple):
    """Pad the point axis of (B,P,3) up to a multiple, with far-away points."""
    p = x.shape[1]
    rem = (-p) % multiple
    if rem == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, rem), (0, 0)), constant_values=_PAD_COORD)


def _nn_one_direction_pallas(xyz1, xyz2, tile_n, tile_m, interpret):
    """dist/idx from each xyz1 point to nearest xyz2 point. (B,N,3),(B,M,3)."""
    b, n, _ = xyz1.shape
    # Larger query tiles amortize per-grid-step overhead (tn=2048/tm=512
    # measured fastest at the reference workload); grow tile_n when the
    # padded N allows it without extra padding waste.
    padded_n = n + ((-n) % tile_n)
    for cand in (2048, 1024):
        if cand > tile_n and padded_n % cand == 0:
            tile_n = cand
            break
    xyz1p = _pad_points(xyz1, tile_n)
    xyz2p = _pad_points(xyz2, tile_m)
    np_, mp = xyz1p.shape[1], xyz2p.shape[1]
    x1t = jnp.swapaxes(xyz1p, 1, 2)  # (B, 3, Np) coordinate-major

    grid = (b, np_ // tile_n, mp // tile_m)  # M innermost: sequential scan
    dist, idx = pl.pallas_call(
        functools.partial(_nn_direction_kernel, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda bi, i, t: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda bi, i, t: (bi, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # Outputs carry a unit sublane axis so the (sublane, lane) block
            # dims satisfy TPU tiling; their index maps ignore the M grid
            # dim, making them cross-tile accumulators.
            pl.BlockSpec((1, 1, tile_n), lambda bi, i, t: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_n), lambda bi, i, t: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, np_), xyz1.dtype),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),
        ],
        interpret=interpret,
    )(x1t, xyz2p)
    return dist[:, 0, :n], idx[:, 0, :n]


def _nn_distance_pallas(xyz1, xyz2, tile_n=_DEFAULT_TILE_N,
                        tile_m=_DEFAULT_TILE_M, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dist1, idx1 = _nn_one_direction_pallas(xyz1, xyz2, tile_n, tile_m, interpret)
    dist2, idx2 = _nn_one_direction_pallas(xyz2, xyz1, tile_n, tile_m, interpret)
    return dist1, idx1, dist2, idx2


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _forward(xyz1, xyz2, impl):
    if impl == "xla":
        return _nn_distance_xla(xyz1, xyz2)
    if impl == "pallas":
        return _nn_distance_pallas(xyz1, xyz2)
    raise ValueError(f"unknown nn_distance impl: {impl!r}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nn_distance(xyz1, xyz2, impl):
    return _forward(xyz1, xyz2, impl)


def _nn_distance_fwd(xyz1, xyz2, impl):
    out = _forward(xyz1, xyz2, impl)
    dist1, idx1, dist2, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _nn_distance_bwd(impl, res, cotangents):
    del impl
    xyz1, xyz2, idx1, idx2 = res
    g_d1, _, g_d2, _ = cotangents  # idx cotangents are float0 / symbolic zero

    def one(x1, x2, i1, i2, g1, g2):
        # Direction 1: each x1 point pulls toward its match in x2.
        t1 = 2.0 * g1[:, None] * (x1 - x2[i1])  # (N,3)
        # Direction 2: each x2 point pulls toward its match in x1.
        t2 = 2.0 * g2[:, None] * (x2 - x1[i2])  # (M,3)
        gx1 = t1 + jnp.zeros_like(x1).at[i2].add(-t2)
        gx2 = t2 + jnp.zeros_like(x2).at[i1].add(-t1)
        return gx1, gx2

    gx1, gx2 = jax.vmap(one)(xyz1, xyz2, idx1, idx2, g_d1, g_d2)
    return gx1, gx2


_nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def nn_distance(xyz1: jax.Array, xyz2: jax.Array, impl: str | None = None):
    """Nearest-neighbor squared distances between two point clouds.

    Args:
      xyz1: (B, N, 3) float array, first cloud.
      xyz2: (B, M, 3) float array, second cloud.
      impl: "pallas" (default on TPU), "xla" (default elsewhere).

    Returns:
      dist1: (B, N) squared distance from each xyz1 point to nearest xyz2.
      idx1:  (B, N) int32 index of that neighbor.
      dist2: (B, M) squared distance from each xyz2 point to nearest xyz1.
      idx2:  (B, M) int32 index of that neighbor.

    Differentiable in xyz1/xyz2 (argmin held constant), matching the
    reference op's registered gradient.
    """
    if impl is None:
        impl = _auto_impl()
    # Distances are always computed in f32 (the loss path of a possibly-bf16
    # network); the cast sits outside custom_vjp so autodiff converts the
    # gradient dtype back automatically.
    return _nn_distance(xyz1.astype(jnp.float32), xyz2.astype(jnp.float32),
                        impl)


def chamfer_loss(pred: jax.Array, label: jax.Array, impl: str | None = None):
    """mean(dist_fwd + dist_bwd) -- the reference's raw ``pcloss``
    (models/model.py:80-82). The training loss scales this by 100."""
    d1, _, d2, _ = nn_distance(pred, label, impl=impl)
    return jnp.mean(d1) + jnp.mean(d2) if d1.shape != d2.shape else jnp.mean(d1 + d2)

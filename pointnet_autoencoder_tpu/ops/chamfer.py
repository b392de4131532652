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

from pointnet_autoencoder_tpu.ops import tpu as _tpu_mod
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shard_map vma inheritance for the pallas_call out shapes (jax >= 0.9
# requires it; found driving --point_parallel on TPU hardware -- see
# ops/tpu.py:out_vma for the full story).
from pointnet_autoencoder_tpu.ops.tpu import out_vma as _out_vma

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
    return "pallas" if _tpu_mod.compute_on_tpu() else "xla"


# ---------------------------------------------------------------------------
# Dense XLA implementation
# ---------------------------------------------------------------------------


def sqdist_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
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
    d2 = sqdist_matrix(xyz1, xyz2)  # (B,N,M)
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

    Integer-key replacements for the min/argmin chain were measured and
    rejected in round 3 (ARCHITECTURE.md): an exact bitcast-min +
    equality-argmin is bitwise-identical but ~8% slower, and a true
    packed key can't represent 32 d2 bits + the tile index in an int32.
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
            jax.ShapeDtypeStruct((b, 1, np_), xyz1.dtype,
                                 vma=_out_vma(x1t, xyz2p)),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32,
                                 vma=_out_vma(x1t, xyz2p)),
        ],
        interpret=interpret,
    )(x1t, xyz2p)
    return dist[:, 0, :n], idx[:, 0, :n]


def _nn_distance_pallas(xyz1, xyz2, tile_n=_DEFAULT_TILE_N,
                        tile_m=_DEFAULT_TILE_M, interpret=None):
    if interpret is None:
        interpret = not _tpu_mod.compute_on_tpu()
    dist1, idx1 = _nn_one_direction_pallas(xyz1, xyz2, tile_n, tile_m, interpret)
    dist2, idx2 = _nn_one_direction_pallas(xyz2, xyz1, tile_n, tile_m, interpret)
    return dist1, idx1, dist2, idx2


# ---------------------------------------------------------------------------
# Pallas backward kernel
# ---------------------------------------------------------------------------
#
# The analytic gradient needs, per point m of cloud 2:
#   gx2[m] = t2[m] - sum_{i: idx1[i]=m} t1[i]
# with t1[i] = 2*g1[i]*(x1[i]-x2[idx1[i]]), t2[m] = 2*g2[m]*(x2[m]-x1[idx2[m]]).
# The sum is a segment-sum (the reference CUDA kernel's atomicAdd scatter,
# tf_nndistance_g.cu:132-157); XLA lowers it to an element-serial row scatter
# that costs ~0.93 ms at the training shape. Here both the segment-sum and
# the x1[idx2] gather are expressed as one-hot matmuls whose masks are
# generated in VMEM per (M-tile, N-tile) block -- nothing of size (N, M)
# touches HBM, and the MXU (idle during the scatter) does the reduction:
#
#   seg[m]  = sum_i 1{idx1[i]=m} * (2 g1[i] x1[i])
#             - x2[m] * sum_i 1{idx1[i]=m} * (2 g1[i])     (factored form)
#   x1g[m]  = sum_i 1{idx2[m]=i} * x1[i]
#
# Precision: the one-hot factors are exact in bf16; the value factors are
# split v = hi + lo (both bf16) so each product is exact and only the f32
# accumulation rounds -- the same error class as the scatter it replaces.


def _nn_grad_direction_kernel(x1_ref, v_ref, idx1_ref, idx2_ref, acc_ref, *,
                              tile_n: int, tile_m: int):
    """Segment-sum + gather accumulators for one (batch, M-tile) over
    sequential N-tiles. The output block is the cross-step accumulator
    (same pattern as the forward kernel's running min): its index map
    ignores the N grid dim and it is read-modified-written as a full block
    every step.

    x1_ref:   (1, TN, 9)  [hi | mid | lo] bf16 split of the x1 n-tile
    v_ref:    (1, TN, 12) [2 g1 x1, 2 g1] hi | mid | lo bf16 split
    idx1_ref: (1, 1, TN)  int32, lane-packed
    idx2_ref: (1, TM, 1)  int32, sublane-packed
    acc_ref:  (1, TM, 24) f32: [0:12] one-hot1 @ v, [12:21] one-hot2 @ x1
    """
    nt = pl.program_id(2)
    m0 = pl.program_id(1) * tile_m
    n0 = nt * tile_n
    m_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 1), 0) + m0
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + n0
    o1 = (idx1_ref[0] == m_ids).astype(jnp.bfloat16)  # (TM, TN)
    o2 = (idx2_ref[0] == n_ids).astype(jnp.bfloat16)  # (TM, TN)
    seg = jnp.dot(o1, v_ref[0], preferred_element_type=jnp.float32)
    gat = jnp.dot(o2, x1_ref[0], preferred_element_type=jnp.float32)
    val = jnp.concatenate(
        [seg, gat, jnp.zeros((tile_m, 3), jnp.float32)], axis=1)

    @pl.when(nt == 0)
    def _first():
        acc_ref[0] = val

    @pl.when(nt != 0)
    def _accumulate():
        acc_ref[0] = acc_ref[0] + val


def _trunc_bf16(x):
    """Truncate f32 to a bf16-exact value, returning (f32 value, residual).

    Masks the low mantissa bits rather than using a f32->bf16->f32 convert
    chain: XLA's excess-precision simplification is allowed to elide that
    round-trip (convert(convert(x, bf16), f32) -> x), which silently zeroes
    the residual and degrades the split to single bf16 rounding. The bitcast
    is opaque to the algebraic simplifier.
    """
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        xi & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi, x - hi


def _split_bf16(x):
    """x (f32) -> [hi | mid | lo] bf16 thirds along the last axis with
    hi + mid + lo == x to ~2^-25 relative. Products against exact 0/1 masks
    are then exact and only the f32 accumulation rounds -- the same error
    class as the XLA scatter this kernel replaces. The extra lanes are free:
    the MXU pads the rhs to 128 lanes either way."""
    hi, r1 = _trunc_bf16(x)
    mid, r2 = _trunc_bf16(r1)
    parts = [hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
             r2.astype(jnp.bfloat16)]
    return jnp.concatenate(parts, axis=-1)


def _pad_axis1(x, multiple, value=0):
    rem = (-x.shape[1]) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def _nn_grad_one_direction_pallas(x1, g1, idx1, x2, g2, idx2,
                                  tile_n, tile_m, interpret):
    """gx2 (B, M, 3) given the matched indices and dist cotangents.

    Padding is self-masking: padded x1 rows carry v = 0 (g1 padded with 0),
    padded idx1 lanes point at m=0 but multiply v = 0; padded idx2 rows
    produce garbage rows that are sliced off; padded m rows never match a
    real idx1 value (< M).
    """
    b, n, _ = x1.shape
    m = x2.shape[1]
    v = jnp.concatenate(
        [2.0 * g1[..., None] * x1, 2.0 * g1[..., None]], axis=-1)  # (B,N,4)
    x1p = _pad_axis1(x1, tile_n)
    vp = _pad_axis1(v, tile_n)
    idx1p = jnp.pad(idx1[:, None, :],
                    ((0, 0), (0, 0), (0, (-n) % tile_n)))  # (B, 1, Np)
    idx2p = _pad_axis1(idx2[..., None], tile_m)
    np_, mp = x1p.shape[1], idx2p.shape[1]

    grid = (b, mp // tile_m, np_ // tile_n)  # N innermost: sequential scan
    acc = pl.pallas_call(
        functools.partial(_nn_grad_direction_kernel,
                          tile_n=tile_n, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, 9), lambda bi, mt, nt: (bi, nt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, 12), lambda bi, mt, nt: (bi, nt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_n), lambda bi, mt, nt: (bi, 0, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 1), lambda bi, mt, nt: (bi, mt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, 24), lambda bi, mt, nt: (bi, mt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, mp, 24), jnp.float32,
            vma=_out_vma(x1p, vp, idx1p, idx2p)),
        interpret=interpret,
    )(_split_bf16(x1p), _split_bf16(vp), idx1p, idx2p)
    acc = acc[:, :m, :]
    s = acc[..., 0:4] + acc[..., 4:8] + acc[..., 8:12]   # o1 @ [2 g1 x1, 2 g1]
    x1g = acc[..., 12:15] + acc[..., 15:18] + acc[..., 18:21]  # x1[idx2]
    t2 = 2.0 * g2[..., None] * (x2 - x1g)
    return t2 - (s[..., 0:3] - x2 * s[..., 3:4])


def _nn_distance_bwd_pallas(xyz1, xyz2, idx1, idx2, g_d1, g_d2,
                            tile_n=_DEFAULT_TILE_N, tile_m=_DEFAULT_TILE_M,
                            interpret=None):
    if interpret is None:
        interpret = not _tpu_mod.compute_on_tpu()
    gx2 = _nn_grad_one_direction_pallas(
        xyz1, g_d1, idx1, xyz2, g_d2, idx2, tile_n, tile_m, interpret)
    gx1 = _nn_grad_one_direction_pallas(
        xyz2, g_d2, idx2, xyz1, g_d1, idx1, tile_n, tile_m, interpret)
    return gx1, gx2


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
    xyz1, xyz2, idx1, idx2 = res
    g_d1, _, g_d2, _ = cotangents  # idx cotangents are float0 / symbolic zero
    if impl == "pallas":
        return _nn_distance_bwd_pallas(xyz1, xyz2, idx1, idx2, g_d1, g_d2)

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


def fscore(pred: jax.Array, target: jax.Array, threshold: float = 0.01,
           impl: str | None = None) -> jax.Array:
    """Per-shape reconstruction F-score at a distance threshold.

    The standard point-cloud reconstruction metric (Tatarchenko et al.,
    CVPR 2019): harmonic mean of precision (fraction of pred points within
    ``threshold`` of the target) and recall (fraction of target points
    within ``threshold`` of the pred). ``nn_distance`` returns SQUARED
    distances, so membership compares against ``threshold**2``. Returns
    (B,) f32 in [0, 1]; 1 only when every point of each cloud has a
    neighbor in the other within the threshold.

    Evaluation-only addition — the reference's sole metric is the raw
    mean Chamfer (``pcloss``, models/model.py:82); F-score is reported
    alongside it, never trained on.
    """
    d1, _, d2, _ = nn_distance(pred, target, impl=impl)
    t2 = jnp.asarray(threshold, jnp.float32) ** 2
    precision = jnp.mean((d1 < t2).astype(jnp.float32), axis=1)
    recall = jnp.mean((d2 < t2).astype(jnp.float32), axis=1)
    return 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-12)

"""Point (sequence) parallelism: losses over clouds sharded along N.

Covers both loss families: Chamfer (``nn_distance_point_sharded`` /
``chamfer_loss_point_sharded``) and the annealed approximate EMD
(``emd_cost_point_sharded`` / ``emd_loss_point_sharded`` — see the EMD
section below for its psum-per-level decomposition).

Chamfer: the single-chip long-N strategy (docs/ARCHITECTURE.md: tiled Pallas
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

Every entry point also composes with data parallelism (``batch_axis``):
on a 2-D mesh the batch dimension shards over one axis while each data
group runs the point-sharded op over the other -- the point collectives
(pmin / per-level psum) stay within the group, the gradient all-reduce
over the batch axis remains GSPMD's job. ``make_sp_step_fns(...,
batch_axis=...)`` is the composed DP x SP train step.
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


def _pvary(x, axis):
    """Mark a replicated value as device-varying over ``axis`` (a name or
    tuple of names; pcast on jax >= 0.9, where lax.pvary is deprecated;
    pvary on older releases)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis, to="varying")
    return jax.lax.pvary(x, axis)


def _shard_body(x1, x2, *, axis: str, impl: Optional[str]):
    """Per-device body: x1 is the local (B, N/k, 3) slice, x2 replicated."""
    shard_n = x1.shape[1]
    # Mark the replicated cloud as device-varying before it enters the
    # kernel: its per-shard cotangents differ, and pvary is what tells
    # shard_map's transpose to psum them back to the replicated spec.
    x2 = _pvary(x2, axis)
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


def _check_divisible(n: int, mesh: Mesh, axis: str, what: str = "point"):
    k = mesh.shape[axis]
    if n % k != 0:
        label = "N" if what == "point" else "B"
        raise ValueError(
            f"{what} axis {label}={n} must divide by mesh axis "
            f"{axis!r} size {k}"
        )


def nn_distance_point_sharded(xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh,
                              axis: str = DATA_AXIS,
                              impl: Optional[str] = None,
                              batch_axis: Optional[str] = None):
    """nn_distance with xyz1's point axis sharded over ``mesh[axis]``.

    Args:
      xyz1: (B, N, 3); N must divide by the mesh axis size. Sharded along
        N over ``axis`` (re-placed if it arrives with another sharding).
      xyz2: (B, M, 3); replicated over ``axis``.
      mesh: the device mesh; ``axis`` names the point-parallel dimension.
      impl: per-shard kernel choice, as ``ops.chamfer.nn_distance``.
      batch_axis: optional second mesh axis sharding BOTH clouds' batch
        dimension — the DP x SP composition (each data-parallel group runs
        the point-sharded op on its batch slice; the point collectives
        stay within the group). B must divide by its size.

    Returns the usual (dist1, idx1, dist2, idx2): dist1/idx1 sharded along
    N, dist2/idx2 replicated over ``axis`` (all sharded over ``batch_axis``
    when given). Indices are exact vs the unsharded op (including
    first-min tie-breaks); distances match to 1 ulp (see module
    docstring). Differentiable in both clouds.
    """
    _check_divisible(xyz1.shape[1], mesh, axis)
    if batch_axis is not None:
        _check_divisible(xyz1.shape[0], mesh, batch_axis, what="batch")
    fn = jax.shard_map(
        partial(_shard_body, axis=axis, impl=impl),
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(batch_axis)),
        out_specs=(P(batch_axis, axis), P(batch_axis, axis),
                   P(batch_axis), P(batch_axis)),
    )
    xyz1 = jax.lax.with_sharding_constraint(
        xyz1.astype(jnp.float32),
        NamedSharding(mesh, P(batch_axis, axis, None)))
    xyz2 = jax.lax.with_sharding_constraint(
        xyz2.astype(jnp.float32), NamedSharding(mesh, P(batch_axis)))
    return fn(xyz1, xyz2)


def chamfer_loss_point_sharded(xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh,
                               axis: str = DATA_AXIS,
                               impl: Optional[str] = None,
                               batch_axis: Optional[str] = None) -> jax.Array:
    """mean(dist1) + mean(dist2) over the point-sharded op (the reference
    loss contract, models/model.py:77-83, at mesh scale)."""
    d1, _, d2, _ = nn_distance_point_sharded(xyz1, xyz2, mesh, axis=axis,
                                             impl=impl, batch_axis=batch_axis)
    return jnp.mean(d1) + jnp.mean(d2)


# ---------------------------------------------------------------------------
# Point-sharded approximate EMD
# ---------------------------------------------------------------------------
#
# The annealed matching (ops/emd.py module docstring; reference GPU kernel
# tf_approxmatch_g.cu:21-175) decomposes exactly along xyz1's point axis:
# with the rows (xyz1 points) sharded and xyz2 replicated,
#
#   * sweep 1 (row normalizers)   -- local: each row's sum over M is on-shard;
#   * sweep 2 (column saturation) -- one psum of the per-shard (B, M) column
#     sums per annealing level; after it, the remainR/ratioR trajectory is
#     computed identically (replicated) on every device;
#   * sweep 3 (mass accumulation) -- local rows; the cost and the xyz2
#     gradient are linear accumulations, so their psums defer to one each
#     after the 10-level scan.
#
# Total communication: 10 x psum((B, M) f32) + 2 trailing psums -- a few MB
# over ICI, vs the O(B*N*M) pairwise work that stays shard-local. The
# decomposition is exact up to f32 summation order (the psum adds per-shard
# partials where the dense op adds over rows in index order).
#
# The per-shard body is the dense formulation, not the fused Pallas kernel:
# the kernel holds its d2 cache and remain state in VMEM *across* all 10
# levels, and the per-level psum is a synchronization point no single
# pallas_call can span. Each shard instead materializes its (B, N/k, M) d2
# slice once in HBM -- k devices extend the dense path's single-chip memory
# ceiling k-fold, which is the point: this is the mesh-scale EMD for clouds
# past the fused kernel's N=8192 single-chip envelope. At the training
# shape, keep the fused kernel (parallel/README in docs/ARCHITECTURE.md).


def _emd_shard_body(x1, x2, *, axis: str, n_global: int,
                    batch_axes: tuple = ()):
    """Per-device body: x1 is the local (B, N/k, 3) row slice, x2 replicated.

    Returns (cost (B,), grad1 (B, N/k, 3), grad2 (B, M, 3)): the fused
    plan-free contract of ops/emd.py:_emd_forward, with grads taken at a
    held-fixed transport plan (the reference's MatchCostGrad semantics).

    ``batch_axes``: extra mesh axes the batch dimension is sharded over
    (the DP x SP composition); fresh-created scan carries must be marked
    varying over them too, or the first iteration's batch-varying results
    change the carry's variance type.
    """
    from pointnet_autoencoder_tpu.ops import emd as emdlib
    from pointnet_autoencoder_tpu.ops.chamfer import sqdist_matrix

    b, n_loc, _ = x1.shape
    m = x2.shape[1]
    multi_l, multi_r = emdlib._capacities(n_global, m)
    f32 = jnp.float32
    x2 = _pvary(x2, axis)

    d2 = sqdist_matrix(x1, x2)  # (B, n_loc, M), shard-local
    d = jnp.sqrt(d2)
    rinv = jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
    levels = jnp.asarray(emdlib._LEVELS, f32)

    def round_fn(carry, level):
        remain_l, remain_r, cost, grad1, grad2 = carry
        k_mat = jnp.exp(level * d2)
        # Sweep 1: row normalizers (rows are local).
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", k_mat, remain_r)
        ratio_l = remain_l / suml
        # Sweep 2: global column sums via psum; the saturation update is
        # then replicated arithmetic on every device.
        sumr = jax.lax.psum(
            jnp.einsum("bnm,bn->bm", k_mat, ratio_l), axis) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # Sweep 3: local mass, local cost/grad contributions.
        w = k_mat * ratio_l[:, :, None] * ratio_r[:, None, :]
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
        cost = cost + jnp.einsum("bnm,bnm->b", w, d)
        wr = w * rinv
        for c in range(3):
            diff = x1[:, :, None, c] - x2[:, None, :, c]
            wd = wr * diff
            grad1 = grad1.at[:, :, c].add(jnp.sum(wd, axis=2))
            grad2 = grad2.at[:, :, c].add(-jnp.sum(wd, axis=1))
        return (remain_l, remain_r, cost, grad1, grad2), None

    # remain_r stays device-invariant over ``axis`` (psum output +
    # replicated arithmetic) but varies over any batch axes; everything
    # shard-local starts pvaried to keep the scan carry's varying-axes
    # type fixed across iterations.
    local = (axis,) + batch_axes
    init = (
        _pvary(jnp.full((b, n_loc), multi_l, f32), local),
        (_pvary(jnp.full((b, m), multi_r, f32), batch_axes)
         if batch_axes else jnp.full((b, m), multi_r, f32)),
        _pvary(jnp.zeros((b,), f32), local),
        _pvary(jnp.zeros((b, n_loc, 3), f32), local),
        _pvary(jnp.zeros((b, m, 3), f32), local),
    )
    (_, _, cost, grad1, grad2), _ = jax.lax.scan(round_fn, init, levels)
    # Cost and the xyz2 gradient are sums over all rows: one trailing psum
    # each; grad1 stays sharded alongside its rows.
    return jax.lax.psum(cost, axis), grad1, jax.lax.psum(grad2, axis)


def _emd_forward_point_sharded(xyz1, xyz2, mesh: Mesh, axis: str,
                               batch_axis: Optional[str] = None):
    n = xyz1.shape[1]
    _check_divisible(n, mesh, axis)
    if batch_axis is not None:
        _check_divisible(xyz1.shape[0], mesh, batch_axis, what="batch")
    fn = jax.shard_map(
        partial(_emd_shard_body, axis=axis, n_global=n,
                batch_axes=(batch_axis,) if batch_axis else ()),
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(batch_axis)),
        out_specs=(P(batch_axis), P(batch_axis, axis), P(batch_axis)),
    )
    xyz1 = jax.lax.with_sharding_constraint(
        xyz1.astype(jnp.float32),
        NamedSharding(mesh, P(batch_axis, axis, None)))
    xyz2 = jax.lax.with_sharding_constraint(
        xyz2.astype(jnp.float32), NamedSharding(mesh, P(batch_axis)))
    return fn(xyz1, xyz2)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _emd_cost_point_sharded(xyz1, xyz2, mesh, axis, batch_axis):
    cost, _, _ = _emd_forward_point_sharded(xyz1, xyz2, mesh, axis,
                                            batch_axis)
    return cost


def _emd_cost_ps_fwd(xyz1, xyz2, mesh, axis, batch_axis):
    cost, g1, g2 = _emd_forward_point_sharded(xyz1, xyz2, mesh, axis,
                                              batch_axis)
    return cost, (g1, g2)


def _emd_cost_ps_bwd(mesh, axis, batch_axis, res, g):
    del mesh, axis, batch_axis
    g1, g2 = res
    return g[:, None, None] * g1, g[:, None, None] * g2


_emd_cost_point_sharded.defvjp(_emd_cost_ps_fwd, _emd_cost_ps_bwd)


def emd_cost_point_sharded(xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh,
                           axis: str = DATA_AXIS,
                           batch_axis: Optional[str] = None) -> jax.Array:
    """Approx-EMD cost (B,) with xyz1's point axis sharded over ``mesh[axis]``.

    Numerically equivalent to ``ops.emd.emd_cost`` (same annealing schedule,
    same plan-constant gradients) up to f32 summation order in the per-level
    column psum; differentiable in both clouds. N must divide by the mesh
    axis size. The cost comes back replicated; under ``jax.grad`` the xyz1
    cotangent is sharded along N and the xyz2 cotangent replicated.
    ``batch_axis`` additionally shards the batch dimension over a second
    mesh axis (DP x SP; the per-level psums stay within each data group).
    """
    return _emd_cost_point_sharded(
        xyz1.astype(jnp.float32), xyz2.astype(jnp.float32), mesh, axis,
        batch_axis)


def emd_loss_point_sharded(pred: jax.Array, label: jax.Array, mesh: Mesh,
                           axis: str = DATA_AXIS,
                           batch_axis: Optional[str] = None) -> jax.Array:
    """mean over batch of approx-EMD(label -> pred) — the reference's EMD
    training loss contract (models/model_emd.py:86-88) with the label
    cloud's points sharded over the mesh."""
    return jnp.mean(emd_cost_point_sharded(label, pred, mesh, axis=axis,
                                           batch_axis=batch_axis))


# ---------------------------------------------------------------------------
# Full point-sharded train step
# ---------------------------------------------------------------------------
#
# The losses above shard the O(N*M) pairwise work; the rest of the train
# step shards for free: the PointNet encoder is pointwise Dense layers +
# a max over points (models/model.py:43-64), so with the batch's POINT axis
# sharded over the mesh, GSPMD partitions the per-point matmuls locally and
# inserts the max-over-points and BatchNorm batch-statistics reductions as
# collectives -- numerically the same global-batch statistics as DP/single
# device. The decoder consumes the replicated (B, 1024) feature and its
# output is pinned replicated at the loss seam (it is the M-side cloud of
# both SP losses). Together this is the true long-N training mode: one
# batch whose clouds exceed a single chip's sweep trains across the mesh
# with every O(N*M) term sharded.


def point_batch_sharding(mesh: Mesh, axis: str = DATA_AXIS,
                         batch_axis: Optional[str] = None) -> NamedSharding:
    """Sharding for a (B, N, 3) batch with the POINT axis sharded (and,
    with ``batch_axis``, the batch axis too — DP x SP)."""
    return NamedSharding(mesh, P(batch_axis, axis, None))


def sp_loss_fn(name: str, mesh: Mesh, axis: str = DATA_AXIS,
               batch_axis: Optional[str] = None):
    """Point-sharded analog of the registry loss contracts
    (models/autoencoder.py: chamfer_x100_loss / emd_loss_fn /
    hierarchy_loss_fn). The label (input) cloud is the sharded side;
    predictions stay replicated. Loss values equal the unsharded contracts
    because mean(d_fwd) + mean(d_bwd) is symmetric in the argument order
    (only the direction labels swap), up to f32 summation order."""

    kw = dict(axis=axis, batch_axis=batch_axis)

    def chamfer100(pred, label, end_points):
        pcloss = chamfer_loss_point_sharded(label, pred, mesh, **kw)
        return pcloss * 100.0, {"pcloss": pcloss}

    if name in ("model", "model_cpu", "model_upconv", "model_fc_upconv"):
        return chamfer100
    if name == "model_emd":

        def emd_fn(pred, label, end_points):
            pcloss = chamfer_loss_point_sharded(label, pred, mesh, **kw)
            loss = emd_loss_point_sharded(pred, label, mesh, **kw)
            return loss, {"pcloss": pcloss}

        return emd_fn
    if name == "model_hierachy":

        def hierarchy_fn(pred, label, end_points):
            pcloss = chamfer_loss_point_sharded(label, pred, mesh, **kw)
            pc1 = chamfer_loss_point_sharded(label, end_points["pc1_xyz"],
                                             mesh, **kw)
            loss = (pcloss + 0.1 * pc1) * 100.0
            return loss, {"pcloss": pcloss, "pc1loss": pc1}

        return hierarchy_fn
    raise ValueError(f"no point-sharded loss for config {name!r}")


def make_sp_step_fns(model, spec, tx, bn_schedule, lr_schedule, mesh: Mesh,
                     axis: str = DATA_AXIS,
                     batch_axis: Optional[str] = None,
                     stochastic_round: bool = False):
    """(train_step, eval_step) with the batch's point axis sharded.

    Same contract as train.loop.make_step_fns; callers feed batches placed
    with ``point_batch_sharding(mesh)``. The decoder output is constrained
    replicated (it is the M-side cloud of the SP losses; its compute is
    O(N) against the losses' O(N^2/k) and the hierarchy/fc decoders keep it
    small). Encoder sharding falls out of GSPMD propagation from the batch
    sharding -- on meshes where the conv5 fused head lowers to Pallas,
    GSPMD keeps the kernel correct regardless of how it chooses to place
    it; the statistics matmuls (fused_head.head_stats) partition into
    local matmuls + psum.

    ``batch_axis``: a second mesh axis sharding the batch dimension — the
    DP x SP composed train step (feed batches placed with
    ``point_batch_sharding(mesh, axis, batch_axis)``). Gradient all-reduce
    over ``batch_axis`` and BN global-batch statistics stay GSPMD's job,
    exactly as in pure DP.
    """
    import dataclasses

    from pointnet_autoencoder_tpu.train.loop import make_step_fns

    sp_spec = dataclasses.replace(
        spec, loss_fn=sp_loss_fn(spec.name, mesh, axis, batch_axis))
    return make_step_fns(model, sp_spec, tx, bn_schedule, lr_schedule,
                         pred_sharding=NamedSharding(mesh, P(batch_axis)),
                         stochastic_round=stochastic_round)

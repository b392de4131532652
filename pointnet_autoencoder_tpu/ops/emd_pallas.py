"""Fused Pallas kernel for the approximate EMD cost + gradients.

The TPU-native endpoint of the reference's three CUDA kernels
(tf_approxmatch_g.cu: approxmatch, matchcost, matchcostgrad): one kernel
per batch element runs all 10 annealing rounds, accumulating the transport
cost and its plan-constant gradients on the fly. Nothing of size N*M ever
touches HBM -- the pairwise terms are recomputed per tile in VMEM (exp is
cheap, bandwidth is not), the only HBM traffic is the input clouds and the
(N+M)*3-sized outputs. The reference instead materializes the (B,M,N) plan
in device memory (tf_approxmatch.cpp:163-166) and reads it back twice.

Orientation scheme (avoids every in-kernel transpose):
  - pairwise tiles are always (TN, M): xyz1 coordinates load as (TN, 1)
    columns from the (N, 3) cloud, xyz2 coordinates as (1, M) rows from a
    pre-transposed (3, M) copy;
  - per-n state (remainL, ratioL) lives as (N, 1) columns in VMEM scratch
    (lane-axis reductions produce columns);
  - per-m state (remainR, ratioR, sumr) lives as (1, M) rows carried
    through the loop (sublane-axis reductions produce rows);
  - grad2 is emitted transposed as (3, M) rows and swapped back by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NUM_LEVELS = 10  # j = 7..-2 (tf_approxmatch_g.cu:21-25); last level is 0


def _pick_tile_n(n: int, m: int, vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Largest divisor of n (multiple of 8, <=512) whose (TN, M) f32 tiles
    fit the budget with ~4 live buffers."""
    limit = max(8, vmem_budget // (4 * 4 * m))
    best = 0
    for t in range(8, min(512, n) + 1, 8):
        if n % t == 0 and t <= limit:
            best = t
    return best


def _emd_kernel(xyz1_ref, x2t_ref, cost_ref, grad1_ref, grad2t_ref,
                remain_l, ratio_l, *, n: int, m: int, tile_n: int,
                multi_l: float, multi_r: float):
    f32 = jnp.float32
    nt = n // tile_n

    grad1_ref[...] = jnp.zeros((1, n, 3), f32)
    grad2t_ref[...] = jnp.zeros((1, 3, m), f32)
    remain_l[...] = jnp.full((n, 1), multi_l, f32)

    x2x = x2t_ref[0, 0:1, :]  # (1, M) rows, VMEM-resident for the whole run
    x2y = x2t_ref[0, 1:2, :]
    x2z = x2t_ref[0, 2:3, :]

    def coords(t):
        idx = pl.ds(t * tile_n, tile_n)
        return (xyz1_ref[0, idx, 0:1], xyz1_ref[0, idx, 1:2],
                xyz1_ref[0, idx, 2:3])

    def d2_tile(t):
        x1x, x1y, x1z = coords(t)
        dx = x1x - x2x  # (TN, M)
        dy = x1y - x2y
        dz = x1z - x2z
        return dx, dy, dz, dx * dx + dy * dy + dz * dz

    def level_body(li, carry):
        remain_r, cost = carry  # (1, M), (1, 1)
        # level = -4^j with j = 7 - li, except the final round is 0.
        level = jnp.where(
            li == _NUM_LEVELS - 1,
            jnp.float32(0.0),
            -jnp.exp2(2.0 * (7.0 - li.astype(f32))),
        )

        # Sweep 1: row normalizers ratioL = remainL / (1e-9 + K @ remainR).
        def s1(t, _):
            idx = pl.ds(t * tile_n, tile_n)
            _, _, _, d2 = d2_tile(t)
            w = jnp.exp(level * d2) * remain_r
            suml = jnp.sum(w, axis=1, keepdims=True) + 1e-9  # (TN, 1)
            ratio_l[idx, :] = remain_l[idx, :] / suml
            return 0

        jax.lax.fori_loop(0, nt, s1, 0)

        # Sweep 2: column saturation.
        def s2(t, sumr):
            idx = pl.ds(t * tile_n, tile_n)
            _, _, _, d2 = d2_tile(t)
            k = jnp.exp(level * d2) * ratio_l[idx, :]
            return sumr + jnp.sum(k, axis=0, keepdims=True)  # (1, M)

        sumr = jax.lax.fori_loop(0, nt, s2, jnp.zeros((1, m), f32))
        sumr = sumr * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)

        # Sweep 3: transported mass -> cost, grads, remaining capacities.
        def s3(t, cost):
            idx = pl.ds(t * tile_n, tile_n)
            dx, dy, dz, d2 = d2_tile(t)
            w = jnp.exp(level * d2) * ratio_l[idx, :] * ratio_r  # (TN, M)
            remain_l[idx, :] = jnp.maximum(
                0.0, remain_l[idx, :] - jnp.sum(w, axis=1, keepdims=True)
            )
            cost = cost + jnp.sum(w * jnp.sqrt(d2)).reshape(1, 1)
            wr = w * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
            for c, dc in ((0, dx), (1, dy), (2, dz)):
                wd = wr * dc
                grad1_ref[0, idx, c:c + 1] = (
                    grad1_ref[0, idx, c:c + 1]
                    + jnp.sum(wd, axis=1, keepdims=True)
                )
                grad2t_ref[0, c:c + 1, :] = (
                    grad2t_ref[0, c:c + 1, :]
                    - jnp.sum(wd, axis=0, keepdims=True)
                )
            return cost

        cost = jax.lax.fori_loop(0, nt, s3, cost)
        return remain_r, cost

    init = (jnp.full((1, m), multi_r, f32), jnp.zeros((1, 1), f32))
    _, cost = jax.lax.fori_loop(0, _NUM_LEVELS, level_body, init)
    cost_ref[0] = cost


def emd_forward_pallas(xyz1: jax.Array, xyz2: jax.Array,
                       interpret: bool | None = None):
    """(cost (B,), grad1 (B,N,3), grad2 (B,M,3)) via the fused kernel.

    Returns None if the shapes don't suit the kernel (caller falls back to
    the dense path): N must have a divisor that is a multiple of 8 within
    the VMEM budget.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    # The (N, 3) input block lane-pads 3 -> 128 in VMEM (N*512 bytes); cap it
    # so large clouds fall back to the dense path instead of VMEM-OOMing.
    if n > 8192:
        return None
    tile_n = _pick_tile_n(n, m)
    if tile_n == 0:
        return None
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0

    x1 = xyz1.astype(jnp.float32)
    x2t = jnp.swapaxes(xyz2.astype(jnp.float32), 1, 2)  # (B, 3, M)

    kernel = functools.partial(
        _emd_kernel, n=n, m=m, tile_n=tile_n,
        multi_l=multi_l, multi_r=multi_r,
    )
    cost, grad1, grad2t = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),  # remainL
            pltpu.VMEM((n, 1), jnp.float32),  # ratioL
        ],
        interpret=interpret,
    )(x1, x2t)
    return cost[:, 0, 0], grad1, jnp.swapaxes(grad2t, 1, 2)

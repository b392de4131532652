"""Fused Pallas kernel for the approximate EMD cost + gradients.

The TPU-native endpoint of the reference's three CUDA kernels
(tf_approxmatch_g.cu: approxmatch, matchcost, matchcostgrad): one kernel
per batch element runs all 10 annealing rounds, accumulating the transport
cost and its plan-constant gradients on the fly. The only HBM traffic is
the input clouds and the (N+M)*3-sized outputs. The reference instead
materializes the (B,M,N) plan in device memory (tf_approxmatch.cpp:163-166)
and reads it back twice.

Orientation scheme (avoids every in-kernel transpose):
  - pairwise tiles are always (TN, M): xyz1 coordinates load as (TN, 1)
    columns from the (N, 3) cloud, xyz2 coordinates as (1, M) rows from a
    pre-transposed (3, M) copy;
  - per-n state (remainL, ratioL) lives as (N, 1) columns in VMEM scratch
    (lane-axis reductions produce columns);
  - per-m state (remainR, ratioR, sumr) lives as (1, M) rows carried
    through the loop (sublane-axis reductions produce rows);
  - grad2 is emitted transposed as (3, M) rows and swapped back by XLA.

Round-2 structure (docs/ARCHITECTURE.md has the measured history):
  - The pairwise squared distances are level-independent, so they are
    computed ONCE into a (N, M) f32 VMEM scratch and reused by all 10
    annealing levels (v5e VMEM is ~128 MB; Mosaic's default cap had to be
    raised). For clouds too large to cache, the same kernel recomputes d2
    per pass (`cache_d2=False`).
  - Sweeps 1 (row normalize) and 2 (column saturation) fuse into one pass
    per level sharing a single exp evaluation: ratioL for a row depends
    only on that row's lane-sum, so each (TN, M) tile can compute its
    ratioL rows and immediately contribute k * ratioL to the running
    column sums -- bit-identical to the separate sweeps, one exp cheaper.

  - exp(level*d2) is evaluated as exp2(level*log2(e)*d2) -- base-2 is the
    VPU's native exponential -- and the cost term w*sqrt(d2) is computed
    as wr*d2 with wr = w*rsqrt(d2), eliding the sqrt. Both are
    numerically equivalent (measured identical error vs the dense path).

Per pair per level this costs 2 exp and (amortized) ~0.1 d2 evaluations
instead of the 3 exp + 3 d2 of the round-1 kernel; an (m-tiled, full-N
resident) restructure with a lower op count measured slower and was
rejected -- see ARCHITECTURE.md. Measured 23.8 -> 11.1 ms at B=32,
N=M=2048 (2.6x faster than the dense XLA path in the same session).

Round-3 follow-ups, both measured and rejected (ARCHITECTURE.md has the
numbers): caching pass A's k*ratioL tiles in a second f32 VMEM scratch so
pass B skips its exp2 (bitwise-identical but ~6% slower -- the kernel is
VPU issue-bound and the 16 MB/level store+reload costs more slots than
one exp2), and early-annealing-level tile skipping (the (TN, M) tiles
span all of M, so on reconstruction-shaped data every tile contains a
near-zero d2 and the skip never fires).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.ops import tpu as _tpu_mod
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NUM_LEVELS = 10  # j = 7..-2 (tf_approxmatch_g.cu:21-25); last level is 0
_LOG2E = math.log2(math.e)

from pointnet_autoencoder_tpu.ops.tpu import (
    VMEM_LIMIT_BYTES as _VMEM_LIMIT,
    out_vma,
)

# Up to a full (4096, 4096) f32 distance cache: measured 8.7 ms vs 11.2 ms
# for the recompute branch at B=4, N=M=4096 (exact same results).
_D2_CACHE_BUDGET = 64 * 1024 * 1024


def _vmem_estimate_bytes(n: int, m: int, tile_n: int,
                         cache_d2: bool) -> int:
    """Analytic VMEM footprint of one grid step's buffers.

    Block buffers (double-buffered by the Mosaic pipeline): the (1, N, 3)
    xyz1 input and grad1 output lane-pad 3 -> 128 (512*N bytes each); the
    (1, 3, M) x2t input and grad2t output sublane-pad 3 -> 8 (32*M each).
    Scratch (single-buffered): remainL/ratioL are (N, 1) columns that
    lane-pad 1 -> 128 (512*N each), plus the optional (N, M) f32 d2 cache.
    Working set: ~4 live (TN, M) f32 tiles inside the level loops.

    Calibrated against shapes measured to compile under the 100 MB cap:
    B=32 N=M=2048 cached (~40 MB here), B=4 N=M=4096 cached (~97 MB,
    round-2 hardware-validated), N=M=16384 uncached (~69 MB, validated
    round 4); N=M=32768 (~105 MB) correctly falls back to the streaming
    XLA path (ops/emd.py:_emd_forward_chunked)."""
    blocks = 2 * 2 * (512 * n + 32 * m)  # (in + out) x double-buffering
    scratch = 2 * 512 * n + (4 * n * m if cache_d2 else 0)
    working = 4 * 4 * tile_n * m
    return blocks + scratch + working


def _pick_tile_n(n: int, m: int, vmem_budget: int = 24 * 1024 * 1024) -> int:
    """Largest divisor of n (multiple of 8, <=512) whose (TN, M) f32 tiles
    fit the budget with ~4 live buffers. Returns 0 (-> caller falls back
    to the dense path) when even an 8-row tile would blow the budget
    (very wide M); flooring to 8 regardless would hand Mosaic a
    guaranteed VMEM compile failure instead of the documented fallback."""
    limit = vmem_budget // (4 * 4 * m)
    if limit < 8:
        return 0
    best = 0
    for t in range(8, min(512, n) + 1, 8):
        if n % t == 0 and t <= limit:
            best = t
    return best


def _emd_kernel(xyz1_ref, x2t_ref, cost_ref, grad1_ref, grad2t_ref,
                remain_l, ratio_l, d2c=None, *, n: int, m: int, tile_n: int,
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

    def d2_compute(t):
        x1x, x1y, x1z = coords(t)
        dx = x1x - x2x  # (TN, M)
        dy = x1y - x2y
        dz = x1z - x2z
        return dx * dx + dy * dy + dz * dz

    if d2c is not None:
        # Distances are level-independent: fill the cache once, reuse for
        # all 10 levels x 2 passes.
        def fill(t, _):
            d2c[pl.ds(t * tile_n, tile_n), :] = d2_compute(t)
            return 0

        jax.lax.fori_loop(0, nt, fill, 0)

        def d2_of(t):
            return d2c[pl.ds(t * tile_n, tile_n), :]
    else:
        d2_of = d2_compute

    def level_body(li, carry):
        remain_r, cost = carry  # (1, M), (1, 1)
        # level = -4^j with j = 7 - li, except the final round is 0; folded
        # with log2(e) so the kernel evaluates exp2 (the VPU primitive).
        level2 = jnp.where(
            li == _NUM_LEVELS - 1,
            jnp.float32(0.0),
            -_LOG2E * jnp.exp2(2.0 * (7.0 - li.astype(f32))),
        )

        # Pass A: fused sweeps 1+2 -- row normalizers ratioL =
        # remainL / (1e-9 + K @ remainR), and the column saturation sums
        # K^T @ ratioL, sharing one exp tile (ratioL rows are tile-local).
        def sa(t, colacc):
            idx = pl.ds(t * tile_n, tile_n)
            k = jnp.exp2(level2 * d2_of(t))
            suml = jnp.sum(k * remain_r, axis=1, keepdims=True) + 1e-9
            rl = remain_l[idx, :] / suml
            ratio_l[idx, :] = rl
            return colacc + jnp.sum(k * rl, axis=0, keepdims=True)  # (1, M)

        sumr = jax.lax.fori_loop(0, nt, sa, jnp.zeros((1, m), f32))
        sumr = sumr * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)

        # Pass B (sweep 3): transported mass -> cost, grads, capacities.
        def sb(t, cost):
            idx = pl.ds(t * tile_n, tile_n)
            d2 = d2_of(t)
            w = jnp.exp2(level2 * d2) * ratio_l[idx, :] * ratio_r  # (TN, M)
            remain_l[idx, :] = jnp.maximum(
                0.0, remain_l[idx, :] - jnp.sum(w, axis=1, keepdims=True)
            )
            wr = w * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
            # w * sqrt(d2) == wr * d2: the rsqrt already paid for the root.
            cost = cost + jnp.sum(wr * d2).reshape(1, 1)
            x1x, x1y, x1z = coords(t)
            for c, x1c, x2c in ((0, x1x, x2x), (1, x1y, x2y), (2, x1z, x2z)):
                wd = wr * (x1c - x2c)
                grad1_ref[0, idx, c:c + 1] = (
                    grad1_ref[0, idx, c:c + 1]
                    + jnp.sum(wd, axis=1, keepdims=True)
                )
                grad2t_ref[0, c:c + 1, :] = (
                    grad2t_ref[0, c:c + 1, :]
                    - jnp.sum(wd, axis=0, keepdims=True)
                )
            return cost

        cost = jax.lax.fori_loop(0, nt, sb, cost)
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
        interpret = not _tpu_mod.compute_on_tpu()
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tile_n = _pick_tile_n(n, m)
    if tile_n == 0:
        return None
    # VMEM envelope (replaces round-2's conservative hard N<=8192 guard):
    # cache d2 when both the cache budget and the total footprint allow;
    # past the uncached footprint, fall back to the streaming XLA path.
    cache_d2 = (n * m * 4 <= _D2_CACHE_BUDGET
                and _vmem_estimate_bytes(n, m, tile_n, True) <= _VMEM_LIMIT)
    if (not cache_d2
            and _vmem_estimate_bytes(n, m, tile_n, False) > _VMEM_LIMIT):
        return None
    # Same integer capacity factors as the dense path (emd._capacities;
    # local import -- emd imports this module lazily).
    from pointnet_autoencoder_tpu.ops.emd import _capacities

    multi_l, multi_r = _capacities(n, m)

    x1 = xyz1.astype(jnp.float32)
    x2t = jnp.swapaxes(xyz2.astype(jnp.float32), 1, 2)  # (B, 3, M)

    kernel = functools.partial(
        _emd_kernel, n=n, m=m, tile_n=tile_n,
        multi_l=multi_l, multi_r=multi_r,
    )
    scratch = [
        pltpu.VMEM((n, 1), jnp.float32),  # remainL
        pltpu.VMEM((n, 1), jnp.float32),  # ratioL
    ]
    if cache_d2:
        scratch.append(pltpu.VMEM((n, m), jnp.float32))  # d2 cache
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
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32,
                                 vma=out_vma(x1, x2t)),
            jax.ShapeDtypeStruct((b, n, 3), jnp.float32,
                                 vma=out_vma(x1, x2t)),
            jax.ShapeDtypeStruct((b, 3, m), jnp.float32,
                                 vma=out_vma(x1, x2t)),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x1, x2t)
    return cost[:, 0, 0], grad1, jnp.swapaxes(grad2t, 1, 2)

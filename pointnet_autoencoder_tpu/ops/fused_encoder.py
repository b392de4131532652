"""Whole-encoder fusion for eval/serving: the five-layer per-point MLP
chain + max-over-points as ONE Pallas kernel.

In eval mode BatchNorm is a constant per-channel affine (moving statistics;
no batch moments, no mutation), so the entire PointNet encoder
(models/model.py:43-64: conv1..conv5 + max-pool) is pure per-point math.
The training path must stop between layers to take global batch statistics
(see ops/fused_head.py for how the conv5 stage alone is fused there); the
eval path has no such barrier, so the fusion can span all five layers:
each point tile walks the whole MLP chain in VMEM and contributes to a
running channel max. HBM sees the points once (B*N*3) and the (B, 1024)
features once -- the five activation tensors (up to (B*N, 1024)) never
exist. This is the program InferenceSession compiles per forward; it also
serves the train loop's eval epochs.

Forward-only by design: serving and eval epochs never differentiate, and
the training forward cannot use it (batch statistics). There is no VJP.

Reference parity: eval-time behavior of tf_util.conv2d(+bn,+relu) x5 and
max_pool2d (utils/tf_util.py:120-187, 368; models/model.py:43-64), with
the BN affine folded per layer exactly as ops/fused_head._fold_affine.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.ops import tpu as _tpu_mod
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet_autoencoder_tpu.ops.fused_head import (
    _fold_affine,
    _pick_tile_n,
)
from pointnet_autoencoder_tpu.ops.tpu import (
    VMEM_LIMIT_BYTES as _VMEM_LIMIT,
    matmul_precision as _precision,
    out_vma,
)

# (w, b, gamma, beta, mean, var) for one Dense+BN layer.
LayerParams = Tuple[jax.Array, jax.Array, jax.Array, jax.Array,
                    jax.Array, jax.Array]


def supports_pallas(n: int, widths: Sequence[int]) -> bool:
    """Tile exists and the chain's VMEM residents stay modest: every weight
    plus one (TN, F) activation per layer fits far under the cap for the
    encoder's 3->64->64->64->128->1024 geometry; cap the widest layer so a
    pathological caller falls back to the composed path instead of OOMing.
    Static-shape-only so callers can pick their branch before declaring
    parameters (flax scopes forbid declaring both branches)."""
    return _pick_tile_n(n) > 0 and all(f <= 4096 for f in widths)


def _eval_kernel(x_ref, *refs, num_layers: int, dtype):
    """refs = w_1, scale_1, shift_1, ..., w_{L-1}, ..., w_L, max_ref, min_ref.

    Inner layers apply their folded affine + ReLU per element (the
    nonlinearity feeds the next matmul). The LAST layer's affine + ReLU are
    monotone per channel, so they commute with the max: the kernel tracks
    the running (max, min) of the raw matmul output y_L and the caller
    applies scale/shift/ReLU to the per-channel extremum -- two reduction
    ops per element instead of affine+ReLU+max (four)."""
    j = pl.program_id(1)
    max_ref, min_ref = refs[-2], refs[-1]
    x = x_ref[0].astype(dtype)  # (TN, C0)
    for i in range(num_layers - 1):
        w, scale, shift = refs[3 * i], refs[3 * i + 1], refs[3 * i + 2]
        y = jnp.dot(x, w[...], preferred_element_type=jnp.float32,
                    precision=_precision(dtype))
        o = jnp.maximum(y * scale[0] + shift[0], 0.0)  # (TN, F_i) f32
        # Inter-layer activations are cast to the matmul dtype, mirroring
        # the unfused path's materialized (bf16/f32) activations.
        x = o.astype(dtype)
    y = jnp.dot(x, refs[3 * (num_layers - 1)][...],
                preferred_element_type=jnp.float32,
                precision=_precision(dtype))  # (TN, F_L)
    tmax = jnp.max(y, axis=0, keepdims=True)  # (1, F_L)
    tmin = jnp.min(y, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _init():
        max_ref[0] = tmax
        min_ref[0] = tmin

    @pl.when(j != 0)
    def _update():
        max_ref[0] = jnp.maximum(max_ref[0], tmax)
        min_ref[0] = jnp.minimum(min_ref[0], tmin)


def _default_tile_cap(widths: Sequence[int]) -> int:
    """Largest tile whose ~4 live (TN, F_max) f32 buffers stay under a
    48 MB VMEM budget. Bigger tiles measured strictly faster on v5e
    (0.244 ms at TN=2048 vs 0.306 at 512 vs 0.346 at 256; B=32, N=2048,
    bf16) -- fewer grid steps and better MXU shapes for the small-K
    layers."""
    f_max = max(widths)
    cap = (48 * 1024 * 1024) // (16 * f_max)
    return max(8, (cap // 8) * 8)


def fused_encoder_eval(points: jax.Array, layers: Sequence[LayerParams],
                       eps: float = 1e-3, dtype=jnp.float32,
                       tile_cap: int | None = None,
                       interpret: bool | None = None) -> jax.Array:
    """max over points of the eval-mode Dense+BN+ReLU chain -> (B, F) f32.

    points: (B, N, C0). layers: per layer (w (C,F) in the matmul dtype,
    b, gamma, beta, moving_mean, moving_var). All BN affines are folded
    into (scale, shift) rows outside the kernel; the kernel runs one
    (TN, C)@(C, F) MXU matmul + one VPU affine/ReLU per inner layer per
    tile and a running (max, min) of the final raw matmul across tiles;
    the last layer's monotone affine + ReLU apply to the (B, F) extremum
    here in XLA.
    """
    if interpret is None:
        interpret = not _tpu_mod.compute_on_tpu()
    b, n, _ = points.shape
    if tile_cap is None:
        tile_cap = _default_tile_cap([w.shape[1] for (w, *_r) in layers])
    tile_n = _pick_tile_n(n, cap=tile_cap)
    f_out = layers[-1][0].shape[1]

    operands = [points.astype(dtype)]
    in_specs = [
        pl.BlockSpec((1, tile_n, points.shape[2]), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    for (w, bias, gamma, beta, mean, var) in layers[:-1]:
        scale, shift = _fold_affine(bias, gamma, beta, mean, var, eps)
        f = w.shape[1]
        operands += [w.astype(dtype), scale.reshape(1, f),
                     shift.reshape(1, f)]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    w_last, bias_l, gamma_l, beta_l, mean_l, var_l = layers[-1]
    operands.append(w_last.astype(dtype))
    in_specs.append(pl.BlockSpec(w_last.shape, lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM))

    ymax, ymin = pl.pallas_call(
        functools.partial(_eval_kernel, num_layers=len(layers), dtype=dtype),
        grid=(b, n // tile_n),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, f_out), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f_out), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, f_out), jnp.float32,
                                 vma=out_vma(*operands)),
            jax.ShapeDtypeStruct((b, 1, f_out), jnp.float32,
                                 vma=out_vma(*operands)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    scale_l, shift_l = _fold_affine(bias_l, gamma_l, beta_l, mean_l, var_l,
                                    eps)
    sel = jnp.where(scale_l >= 0.0, ymax[:, 0, :], ymin[:, 0, :])
    return jnp.maximum(sel * scale_l + shift_l, 0.0)

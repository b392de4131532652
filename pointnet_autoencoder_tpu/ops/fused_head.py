"""Fused encoder head: Dense -> BatchNorm -> ReLU -> max-over-points.

The reference encoder's final stage (models/model.py:58-64: conv5 to 1024
channels, then a max-pool over the point axis) dominates the train step's
HBM traffic when expressed as separate XLA ops: the (B*N, 1024) activation
is written and re-read by seven ~200us fusions (~1.4 ms of a ~4 ms step at
B=32, N=2048, bf16 -- docs/ARCHITECTURE.md). This module fuses the whole
head so that activation never exists in HBM:

- **Batch statistics without the activation** (`head_stats`): with
  y = x @ w + b and P = B*N points,

      mean   = E[x] @ w + b                       (a (C,) @ (C,F) matvec)
      E[y^2] = diag(w^T S w) + 2 b (E[x] @ w) + b^2,   S = x^T x / P

  so the exact biased batch moments cost one (C,P)@(P,C) matmul plus
  O(C*F) work -- no (P,F) intermediate. This part is plain XLA: its
  autodiff automatically carries the BatchNorm backward's through-the-
  statistics terms (the dense -sum(g)/P - xhat*sum(g*xhat)/P corrections),
  whose cotangent path is two more (P,C)@(C,C) matmuls.

- **Forward Pallas kernel**: per (batch element, point tile): one MXU
  matmul (TN,C)@(C,F), the folded BN affine (y*scale + shift with
  scale = gamma*rsqrt(var+eps), shift = (b-mean)*scale + beta), ReLU, and
  a running (max, argmax) over point tiles. HBM sees x once and (B,F)
  results.

- **Backward Pallas kernel**: the max-pool makes the upstream gradient
  one-hot along the point axis (one contributing row per (b, channel)),
  so dL/dy needs no recompute of y: a VMEM-generated row-selection mask
  (iota == argmax) scaled by the cotangent feeds two MXU matmuls,
  dx_tile = g_y @ w^T and dw += x_tile^T @ g_y. db/dgamma/dbeta/dmean/dvar
  are O(B*F) XLA reductions of the same one-hot values.

Caveat: dgamma reconstructs xhat at the argmax as (maxout-beta)/gamma and
safe-guards gamma == 0 with a zero contribution; at gamma == 0 the true
derivative has a kink (argmax flips between argmin/argmax of xhat), so no
subgradient choice is canonical there.

Reference parity: tf_util.conv2d + batch_norm + relu (utils/tf_util.py:
120-187, 514-533) followed by tf.nn.max_pool over points
(models/model.py:62-64). The argmax tie-break is "first point wins".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.ops import tpu as _tpu_mod
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet_autoencoder_tpu.ops.tpu import (
    VMEM_LIMIT_BYTES as _VMEM_LIMIT,
    matmul_precision as _precision,
    out_vma,
)


def _auto_impl() -> str:
    return "pallas" if _tpu_mod.compute_on_tpu() else "xla"


def _pick_tile_n(n: int, cap: int = 512) -> int:
    """Largest divisor of n that is a multiple of 8 and <= cap (0 if none)."""
    best = 0
    for t in range(8, min(cap, n) + 1, 8):
        if n % t == 0:
            best = t
    return best


def supports_pallas(n: int, c: int, f: int) -> bool:
    return _pick_tile_n(n) > 0 and f % 128 == 0 and c <= 512


# ---------------------------------------------------------------------------
# Batch statistics from moments (XLA)
# ---------------------------------------------------------------------------


def head_stats(x: jax.Array, w: jax.Array, b: jax.Array):
    """Biased batch (mean, var), both f32 (F,), of y = x @ w + b over all
    leading axes of x, computed from first/second moments of x.

    x: (..., C) in the matmul dtype (bf16 products, f32 accumulation --
    the same precision class as the forward kernel's matmul). Under a
    batch-sharded GSPMD jit the moment reductions become global psums, so
    these are global-batch statistics exactly like BatchNorm's.
    """
    c = x.shape[-1]
    xf = x.reshape(-1, c)
    p = xf.shape[0]
    w32 = w.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    colmean = jnp.mean(xf.astype(jnp.float32), axis=0)  # (C,)
    mm = colmean @ w32  # E[x @ w], (F,)
    s = jax.lax.dot_general(
        xf, xf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(xf.dtype),
    ) / p  # (C, C) second moment
    ey2 = jnp.sum((s @ w32) * w32, axis=0) + 2.0 * b32 * mm + b32 * b32
    mean = mm + b32
    var = jnp.maximum(ey2 - mean * mean, 0.0)
    return mean, var


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, scale_ref, shift_ref, max_ref, arg_ref, *,
                tile_n: int):
    j = pl.program_id(1)
    y = jnp.dot(x_ref[0], w_ref[...], preferred_element_type=jnp.float32,
                precision=_precision(x_ref.dtype))
    o = jnp.maximum(y * scale_ref[0] + shift_ref[0], 0.0)  # (TN, F)
    tmax = jnp.max(o, axis=0, keepdims=True)  # (1, F)
    # First row attaining the max within this tile, as a global point index.
    f = o.shape[1]
    targ = (jnp.argmax(o, axis=0).reshape(1, f).astype(jnp.int32)
            + j * tile_n)

    @pl.when(j == 0)
    def _init():
        max_ref[0] = tmax
        arg_ref[0] = targ

    @pl.when(j != 0)
    def _update():
        take = tmax > max_ref[0]  # strict >: earlier tile wins ties
        max_ref[0] = jnp.where(take, tmax, max_ref[0])
        arg_ref[0] = jnp.where(take, targ, arg_ref[0])


def _forward_pallas(x, w, scale, shift, interpret):
    b, n, c = x.shape
    f = w.shape[1]
    tile_n = _pick_tile_n(n)
    maxout, argmax = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_n=tile_n),
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32,
                                 vma=out_vma(x, w, scale, shift)),
            jax.ShapeDtypeStruct((b, 1, f), jnp.int32,
                                 vma=out_vma(x, w, scale, shift)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w, scale.reshape(1, f), shift.reshape(1, f))
    return maxout[:, 0, :], argmax[:, 0, :]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, w_ref, gv_ref, arg_ref, dx_ref, dw_ref, *,
                tile_n: int, dtype):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (tile_n, gv_ref.shape[-1]), 0) + j * tile_n
    # dL/dy is one-hot along points: the argmax row of each channel. The
    # select stays in f32 (i1 masks for bf16 selects need a (16,128)
    # relayout Mosaic can't produce from an int comparison) and converts
    # after.
    gy = jnp.where(rows == arg_ref[0], gv_ref[0], 0.0).astype(dtype)
    dx_ref[0] = jax.lax.dot_general(
        gy, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(dtype),
    ).astype(dx_ref.dtype)
    dw = jax.lax.dot_general(
        x_ref[0], gy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(dtype),
    )

    @pl.when((i == 0) & (j == 0))
    def _init():
        dw_ref[...] = dw

    @pl.when((i != 0) | (j != 0))
    def _acc():
        dw_ref[...] += dw


def _backward_pallas(x, w, gvals, argmax, interpret):
    """(dx (B,N,C) in x.dtype, dw (C,F) f32) from the one-hot cotangent.

    gvals: (B, F) f32 = upstream-grad * alive-mask * gamma * inv, the value
    each argmax row receives. argmax: (B, F) int32 global point indices.
    """
    b, n, c = x.shape
    f = w.shape[1]
    tile_n = _pick_tile_n(n)
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_n=tile_n, dtype=x.dtype),
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype,
                                 vma=out_vma(x, w, gvals, argmax)),
            jax.ShapeDtypeStruct((c, f), jnp.float32,
                                 vma=out_vma(x, w, gvals, argmax)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w, gvals[:, None, :], argmax[:, None, :])
    return dx, dw


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _fold_affine(b, gamma, beta, mean, var, eps):
    """(scale, shift) f32 rows: o = y_mm * scale + shift with the bias, BN
    normalize, and BN affine all folded (y_mm = x @ w)."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = gamma.astype(jnp.float32) * inv
    shift = (b.astype(jnp.float32) - mean.astype(jnp.float32)) * scale \
        + beta.astype(jnp.float32)
    return scale, shift


def _head_forward(x, w, b, gamma, beta, mean, var, eps, impl, interpret):
    """(maxout, argmax) via the selected implementation."""
    scale, shift = _fold_affine(b, gamma, beta, mean, var, eps)
    if impl == "xla":
        y = jnp.dot(x, w, preferred_element_type=jnp.float32,
                    precision=_precision(x.dtype))
        o = jnp.maximum(y * scale + shift, 0.0)
        return jnp.max(o, axis=1), jnp.argmax(o, axis=1).astype(jnp.int32)
    return _forward_pallas(x, w, scale, shift, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _head_max(x, w, b, gamma, beta, mean, var, eps, impl, interpret):
    return _head_forward(x, w, b, gamma, beta, mean, var, eps, impl,
                         interpret)[0]


def _head_max_fwd(x, w, b, gamma, beta, mean, var, eps, impl, interpret):
    maxout, argmax = _head_forward(x, w, b, gamma, beta, mean, var, eps,
                                   impl, interpret)
    return maxout, (x, w, b, gamma, beta, mean, var, maxout, argmax)


def _head_max_bwd(eps, impl, interpret, res, g):
    x, w, b, gamma, beta, mean, var, maxout, argmax = res
    g = g.astype(jnp.float32)
    gamma32 = gamma.astype(jnp.float32)
    beta32 = beta.astype(jnp.float32)
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = gamma32 * inv

    alive = (maxout > 0.0).astype(jnp.float32)
    dy_sel = g * alive  # (B, F): cotangent of o at the argmax point
    # xhat at the argmax, reconstructed from the max value (see module
    # docstring for the gamma == 0 caveat).
    safe_gamma = jnp.where(gamma32 == 0.0, 1.0, gamma32)
    xhat_star = jnp.where(
        gamma32 == 0.0, 0.0, (maxout - beta32) / safe_gamma)

    sum_dy = jnp.sum(dy_sel, axis=0)  # (F,)
    sum_dyx = jnp.sum(dy_sel * xhat_star, axis=0)
    dgamma = sum_dyx
    dbeta = sum_dy
    dmean = -scale * sum_dy
    dvar = -0.5 * inv * inv * gamma32 * sum_dyx
    db = scale * sum_dy

    gvals = dy_sel * scale  # (B, F): dL/dy at the argmax rows
    if impl == "xla":
        # Dense scatter of the one-hot cotangent, then the two matmuls.
        n = x.shape[1]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
                  == argmax[:, None, :])
        gy = jnp.where(onehot, gvals[:, None, :], 0.0).astype(x.dtype)
        dx = jnp.einsum("bnf,cf->bnc", gy, w,
                        preferred_element_type=jnp.float32,
                        precision=_precision(x.dtype)).astype(x.dtype)
        dw = jnp.einsum("bnc,bnf->cf", x, gy,
                        preferred_element_type=jnp.float32,
                        precision=_precision(x.dtype))
    else:
        dx, dw = _backward_pallas(x, w, gvals, argmax, interpret)
    # Cotangent dtypes must mirror the primal dtypes; b's may differ from
    # w's (the public API allows either).
    return (dx, dw.astype(w.dtype), db.astype(b.dtype), dgamma, dbeta,
            dmean, dvar)


_head_max.defvjp(_head_max_fwd, _head_max_bwd)


def fused_dense_bn_relu_max(x, w, b, gamma, beta, mean, var,
                            eps: float = 1e-3, impl: str | None = None,
                            interpret: bool | None = None):
    """max over axis 1 of relu(batchnorm(x @ w + b)) -> (B, F) f32.

    x: (B, N, C) and w: (C, F) in the matmul dtype (bf16/f32); b may be
    either; gamma/beta/mean/var f32. Normalization uses the given mean/var
    (batch stats from `head_stats` in training, moving stats in eval);
    their cotangents are returned, so composing with `head_stats` under
    autodiff yields the exact full BatchNorm gradient.
    """
    if impl is None:
        impl = _auto_impl()
    if impl == "pallas" and not supports_pallas(x.shape[1], x.shape[2],
                                                w.shape[1]):
        impl = "xla"
    if interpret is None:
        interpret = not _tpu_mod.compute_on_tpu()
    return _head_max(x, w, b, gamma, beta, mean, var, eps, impl, interpret)

"""PointNet encoder, shared by every model config.

The reference builds it as five conv2d layers 64-64-64-128-1024 over a
(B, N, 3, 1) pseudo-image followed by a max-pool over the point axis
(models/model.py:43-64). Here it is five per-point Dense layers -- pure
MXU matmuls over (B*N, C) -- and a ``jnp.max`` over points; the final
conv5 + BN + ReLU + max stage is fused into one Pallas op on TPU
(ops/fused_head.py) so its (B*N, 1024) activation never touches HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointnet_autoencoder_tpu.nn.layers import PointMLP, glorot
from pointnet_autoencoder_tpu.ops.tpu import matmul_precision
from pointnet_autoencoder_tpu.ops import fused_encoder, fused_head


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias})."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", glorot, (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _BNState(nn.Module):
    """Parameter/state holder matching BatchNorm's tree ({beta, gamma} +
    batch_stats {mean, var}); applies the moving-average update when batch
    statistics are supplied."""

    @nn.compact
    def __call__(self, feat: int, batch_mean=None, batch_var=None,
                 momentum=None):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        beta = self.param("beta", nn.initializers.zeros, (feat,))
        gamma = self.param("gamma", nn.initializers.ones, (feat,))
        moving = (ra_mean.value, ra_var.value)
        if batch_mean is not None and not self.is_initializing():
            m = jnp.asarray(momentum, jnp.float32)
            ra_mean.value = m * ra_mean.value + (1.0 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1.0 - m) * batch_var
        return moving, beta, gamma


class _PointMLPParams(nn.Module):
    """Declares one Dense+BN layer's variables under the exact tree a
    ``PointMLP(name=...)`` (or ``FusedPointMLPMax``) would create -- children
    ``dense`` ({kernel, bias}) and ``bn`` ({beta, gamma} + batch_stats
    {mean, var}) -- and returns them raw instead of applying the layer.
    Lets the whole-encoder eval fusion consume the same checkpoint tree the
    layer-by-layer path trains."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel, bias = _DenseParams(self.features, name="dense")(in_features)
        (mean, var), beta, gamma = _BNState(name="bn")(self.features)
        return kernel, bias, gamma, beta, mean, var


class MomentStatsPointMLP(nn.Module):
    """Dense + BN + ReLU with batch statistics from input moments.

    Same variable tree and same apply-side arithmetic as ``PointMLP``
    (Dense in the matmul dtype, BN affine folded per channel, ReLU); only
    the *statistics* differ: instead of reducing the (B*N, F) pre-BN
    activation twice (mean, mean-of-squares), the exact biased moments
    come from the layer INPUT via the identity in fused_head.head_stats
    (one (C,P)@(P,C) MXU matmul + O(C*F)). Because the stats exist before
    the layer matmul runs, XLA fuses the BN affine + ReLU into the matmul
    epilogue and the raw activation never round-trips HBM; the backward's
    through-the-statistics terms ride head_stats' autodiff (two more
    (P,C)@(C,C) matmuls) instead of big activation reductions. Same
    precision class as the fused conv5 head, which shipped this identity
    in round 2. Under a batch-sharded GSPMD jit the moment reductions are
    global psums, so statistics stay global-batch (DP == single device).
    """

    features: int
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum) -> jax.Array:
        c = x.shape[-1]
        kernel, bias = _DenseParams(self.features, name="dense")(c)
        bn = _BNState(name="bn")
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        bc = bias.astype(self.dtype)
        if train:
            mean, var = fused_head.head_stats(xc, kc, bc)
            (_, _), beta, gamma = bn(self.features, mean, var, bn_momentum)
        else:
            (mean, var), beta, gamma = bn(self.features)
        y = jnp.dot(xc, kc, precision=matmul_precision(self.dtype)) + bc
        # Identical affine arithmetic to layers.BatchNorm: fold in f32,
        # apply in the activation dtype.
        inv = jax.lax.rsqrt(var + self.epsilon) * gamma
        shift = beta - mean * inv
        return jax.nn.relu(y * inv.astype(y.dtype) + shift.astype(y.dtype))


class FusedPointMLPMax(nn.Module):
    """PointMLP(features) followed by max over the point axis, as one op.

    The parameter tree is identical to ``PointMLP(features, name=...)``
    (children ``dense`` and ``bn``), so checkpoints are interchangeable
    with the unfused encoder. ``impl=None`` auto-selects the fused Pallas
    path on TPU and the composed-XLA path elsewhere; the XLA path computes
    statistics exactly as layers.BatchNorm does, keeping CPU numerics
    bit-identical to the unfused head.
    """

    features: int
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum) -> jax.Array:
        c = x.shape[-1]
        kernel, bias = _DenseParams(self.features, name="dense")(c)
        bn = _BNState(name="bn")

        impl = self.impl or fused_head._auto_impl()
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        bc = bias.astype(self.dtype)

        if impl == "pallas":
            if train:
                # bc, not bias: the kernel folds the dtype-cast bias into
                # its affine, so the statistics must describe y = x@kc + bc.
                mean, var = fused_head.head_stats(xc, kc, bc)
                (_, _), beta, gamma = bn(self.features, mean, var, bn_momentum)
            else:
                (mean, var), beta, gamma = bn(self.features)
            out = fused_head.fused_dense_bn_relu_max(
                xc, kc, bc, gamma, beta, mean, var, eps=self.epsilon,
                impl="pallas",
            )
            return out.astype(x.dtype)

        # Composed-XLA path: same arithmetic as PointMLP(bn=True) + max.
        y = jnp.dot(xc, kc, precision=matmul_precision(self.dtype)) + bc
        if train:
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=(0, 1))
            mean2 = jnp.mean(jnp.square(yf), axis=(0, 1))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            (_, _), beta, gamma = bn(self.features, mean, var, bn_momentum)
        else:
            (mean, var), beta, gamma = bn(self.features)
        inv = jax.lax.rsqrt(var + self.epsilon) * gamma
        shift = beta - mean * inv
        o = nn.relu(y * inv.astype(y.dtype) + shift.astype(y.dtype))
        return jnp.max(o, axis=1)


class PointNetEncoder(nn.Module):
    """(B, N, 3) points -> (B, 1024) global feature.

    Training: layer-by-layer (each BN takes global batch statistics), with
    the conv5+BN+ReLU+max head fused (FusedPointMLPMax). Eval/serving with
    the Pallas impl: the ENTIRE chain runs as one kernel
    (ops/fused_encoder.py) -- eval BN is a constant affine, so no
    per-layer statistics barrier exists and no activation touches HBM.
    Both paths read/write the identical variable tree.
    """

    dtype: jnp.dtype = jnp.float32
    head_impl: Optional[str] = None  # None = auto (pallas on TPU)
    # Batch statistics of conv1..conv4 from input moments (the conv5 trick
    # generalized; see MomentStatsPointMLP). Measured EXACTLY at parity
    # with the direct statistics on the flagship step (2.856 vs 2.859 ms
    # best-of-5 interleaved, B=32 N=2048 bf16) -- XLA already overlaps the
    # direct reductions, and conv1-4's narrow channels make both forms
    # cheap. Default False keeps the reference-identical statistics
    # arithmetic; the module + flag stay as the recorded experiment.
    moment_stats: bool = False

    _WIDTHS = (64, 64, 64, 128)

    @nn.compact
    def __call__(self, points, train: bool, bn_momentum) -> jnp.ndarray:
        impl = self.head_impl or fused_head._auto_impl()
        widths = self._WIDTHS + (1024,)
        if (not train and impl == "pallas"
                and fused_encoder.supports_pallas(points.shape[1], widths)):
            layers = []
            c = points.shape[-1]
            for i, feats in enumerate(widths):
                layers.append(
                    _PointMLPParams(feats, name=f"conv{i + 1}")(c))
                c = feats
            out = fused_encoder.fused_encoder_eval(
                points, layers, dtype=self.dtype)
            return out.astype(self.dtype)

        x = points
        mlp = MomentStatsPointMLP if self.moment_stats else PointMLP
        for i, feats in enumerate(self._WIDTHS):
            x = mlp(feats, dtype=self.dtype, name=f"conv{i + 1}")(
                x, train, bn_momentum
            )
        return FusedPointMLPMax(
            1024, dtype=self.dtype, impl=self.head_impl, name="conv5"
        )(x, train, bn_momentum)

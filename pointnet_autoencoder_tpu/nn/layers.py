"""Layer library: the TPU-native equivalent of the reference's utils/tf_util.py.

Key idiomatic translations (SURVEY.md section 7):

- The reference's "shared MLP" conv2d layers with [1,1]/[1,3] kernels
  (utils/tf_util.py:120) *are* per-point dense layers; here they are plain
  ``nn.Dense`` over the channel axis -- batched (B*N, C) x (C, C') matmuls
  that map straight onto the MXU, instead of pretending to be image convs.
- ``tf.contrib.layers.batch_norm`` with a *tensor* decay schedule
  (utils/tf_util.py:514-533, fed from train.py:84-92) becomes ``BatchNorm``
  below, which takes the momentum as a runtime argument so the staircase
  bn_decay schedule stays inside the jitted step without retracing.
- conv2d_transpose (utils/tf_util.py:188, VALID output-shape calc :237-250)
  becomes ``UpConv`` on flax's ConvTranspose, whose VALID geometry
  (out = in*s + max(k-s, 0)) matches the TF slim formula for every stage
  used by the decoders (verified in tests/test_layers.py).

Weight init matches the reference: Xavier/Glorot-uniform kernels
(utils/tf_util.py:41-44), zero biases, BN beta=0 / gamma=1, eps=1e-3.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointnet_autoencoder_tpu.ops.tpu import matmul_precision

glorot = nn.initializers.glorot_uniform()


class BatchNorm(nn.Module):
    """Batch normalization with a runtime momentum (the bn_decay schedule).

    Training: normalizes with batch statistics and updates moving stats
    in-place (the 'batch_stats' collection) as
    ``moving = momentum * moving + (1 - momentum) * batch`` -- identical to
    tf.contrib.layers.batch_norm(decay=bn_decay, updates_collections=None).
    Eval: normalizes with the moving stats.

    ``axis_name``: if set (shard_map/pmap usage), batch statistics are
    averaged across that mesh axis (sync-BN). Under plain GSPMD jit the
    global-batch reduction happens automatically and this stays None.
    """

    epsilon: float = 1e-3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, momentum) -> jax.Array:
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        beta = self.param("beta", nn.initializers.zeros, (feat,))
        gamma = self.param("gamma", nn.initializers.ones, (feat,))

        if train:
            # Statistics always in f32; the elementwise upcast fuses into
            # the reductions, so no f32 copy of a (possibly bf16) activation
            # is ever materialized.
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        # Normalize in the input dtype: y = x*inv + (beta - mean*inv), with
        # the per-channel affine folded in f32 first.
        inv = jax.lax.rsqrt(var + self.epsilon) * gamma
        shift = beta - mean * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class PointMLP(nn.Module):
    """Per-point shared MLP: Dense over the channel axis + BN + ReLU.

    Equivalent of the reference's tf_util.conv2d with [1,1] (or [1,C] on the
    raw xyz input) kernels (models/model.py:43-62) -- on TPU these are just
    (B*N, C) x (C, F) matmuls.
    """

    features: int
    bn: bool = True
    activation: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum=0.9) -> jax.Array:
        x = nn.Dense(
            self.features, kernel_init=glorot, bias_init=nn.initializers.zeros,
            dtype=self.dtype, precision=matmul_precision(self.dtype),
            name="dense",
        )(x)
        if self.bn:
            x = BatchNorm(name="bn")(x, train, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x


class FC(PointMLP):
    """Fully connected + optional BN + ReLU (tf_util.fully_connected:329).

    The same Dense+BN+activation block as PointMLP (a shared MLP *is* a
    per-point FC); only the BN default differs, per the reference's two
    constructors. Variable tree layout is identical."""

    bn: bool = False


class UpConv(nn.Module):
    """Transposed 2D conv + optional BN + ReLU (tf_util.conv2d_transpose:188).

    VALID padding; output spatial dims = in*s + max(k-s, 0), matching the
    reference's slim-derived formula for all decoder stages.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    bn: bool = True
    activation: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum=0.9) -> jax.Array:
        x = nn.ConvTranspose(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding="VALID",
            kernel_init=glorot,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            precision=matmul_precision(self.dtype),
            name="convt",
        )(x)
        if self.bn:
            x = BatchNorm(name="bn")(x, train, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x


class Conv(nn.Module):
    """General N-D convolution + optional BN + ReLU.

    Covers the reference layer library's real (non-pointwise) convolutions
    (tf_util.conv1d:52 / conv2d:120 / conv3d:270). The shipped models only
    ever use pointwise kernels (see PointMLP), but the layer surface is
    part of the library contract. kernel_size length sets the rank
    (1D/2D/3D); channels-last layouts.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: str = "SAME"
    bn: bool = False
    activation: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum=0.9) -> jax.Array:
        x = nn.Conv(
            self.features, kernel_size=tuple(self.kernel_size),
            strides=None if self.strides is None else tuple(self.strides),
            padding=self.padding, kernel_init=glorot,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            precision=matmul_precision(self.dtype), name="conv",
        )(x)
        if self.bn:
            x = BatchNorm(name="bn")(x, train, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x


def max_pool(x, window: Sequence[int], strides: Optional[Sequence[int]] = None,
             padding: str = "VALID") -> jax.Array:
    """N-D max pool over the spatial axes of a channels-last tensor
    (tf_util.max_pool2d:368 / max_pool3d:419). The models' symmetric pool
    over all points is just jnp.max(axis=1); this is the general form."""
    return nn.max_pool(x, tuple(window),
                       strides=tuple(strides or window), padding=padding)


def avg_pool(x, window: Sequence[int], strides: Optional[Sequence[int]] = None,
             padding: str = "VALID") -> jax.Array:
    """N-D average pool (tf_util.avg_pool2d:393 / avg_pool3d:444)."""
    return nn.avg_pool(x, tuple(window),
                       strides=tuple(strides or window), padding=padding)


class Dropout(nn.Module):
    """Dropout gated on the train flag (tf_util.dropout:596). Unused by the
    shipped model configs but part of the layer-library surface."""

    keep_prob: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        return nn.Dropout(rate=1.0 - self.keep_prob, deterministic=not train)(x)

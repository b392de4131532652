"""PointNet encoder, shared by every model config.

The reference builds it as five conv2d layers 64-64-64-128-1024 over a
(B, N, 3, 1) pseudo-image followed by a max-pool over the point axis
(models/model.py:43-64). Here it is five per-point Dense layers -- pure
MXU matmuls over (B*N, C) -- and a ``jnp.max`` over points.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pointnet_autoencoder_tpu.nn.layers import PointMLP


class PointNetEncoder(nn.Module):
    """(B, N, 3) points -> (B, 1024) global feature."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool, bn_momentum) -> jnp.ndarray:
        x = points
        for i, feats in enumerate((64, 64, 64, 128, 1024)):
            x = PointMLP(feats, dtype=self.dtype, name=f"conv{i + 1}")(
                x, train, bn_momentum
            )
        return jnp.max(x, axis=1)  # symmetric pool over the point axis

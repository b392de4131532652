"""Decoder families: fc, upconv, fc_upconv, hierarchy.

Re-designs of the reference decoders (models/model.py:70-73,
model_upconv.py:68-81, model_fc_upconv.py:68-90, model_hierachy.py:67-88)
with identical output geometry. Each decoder consumes the encoder's global
feature and returns (points (B, P, 3), extras dict).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from pointnet_autoencoder_tpu.nn.layers import FC, UpConv


class FCDecoder(nn.Module):
    """1024 -> 1024 -> num_point*3 (models/model.py:70-73)."""

    num_point: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool, bn_momentum) -> Tuple[jnp.ndarray, dict]:
        x = FC(1024, bn=True, dtype=self.dtype, name="fc1")(feat, train, bn_momentum)
        x = FC(1024, bn=True, dtype=self.dtype, name="fc2")(x, train, bn_momentum)
        x = FC(self.num_point * 3, activation=None, dtype=self.dtype, name="fc3")(x)
        return x.reshape(feat.shape[0], self.num_point, 3), {}


class UpconvDecoder(nn.Module):
    """fc00 -> (1,2,512) feature map -> 5 transposed convs -> 32x64 xyz map
    = 2048 points (model_upconv.py:68-81). Requires num_point == 2048."""

    num_point: int
    dtype: jnp.dtype = jnp.float32

    # (features, kernel, stride) per stage; final stage is the linear xyz head.
    _STAGES = (
        (512, (2, 2), (2, 2)),
        (256, (3, 3), (1, 1)),
        (256, (4, 5), (2, 3)),
        (128, (5, 7), (3, 3)),
    )

    @nn.compact
    def __call__(self, feat, train: bool, bn_momentum) -> Tuple[jnp.ndarray, dict]:
        if self.num_point != 2048:
            raise ValueError("upconv decoder requires num_point == 2048")
        b = feat.shape[0]
        x = feat.reshape(b, 1, 2, 512)
        for i, (f, k, s) in enumerate(self._STAGES):
            x = UpConv(f, k, s, dtype=self.dtype, name=f"upconv{i + 1}")(
                x, train, bn_momentum
            )
        x = UpConv(3, (1, 1), (1, 1), bn=False, activation=None,
                   dtype=self.dtype, name="upconv5")(x)
        xyzmap = x  # (B, 32, 64, 3)
        return x.reshape(b, -1, 3), {"xyzmap": xyzmap}


class FCUpconvDecoder(nn.Module):
    """Union of a 1024-point FC branch and a 1024-point upconv branch from a
    512-d embedding (model_fc_upconv.py:73-90). Requires num_point == 2048."""

    num_point: int
    dtype: jnp.dtype = jnp.float32

    _STAGES = (
        (512, (2, 2), (1, 1)),
        (256, (3, 3), (1, 1)),
        (256, (4, 4), (2, 2)),
        (128, (5, 5), (3, 3)),
    )

    @nn.compact
    def __call__(self, feat, train: bool, bn_momentum) -> Tuple[jnp.ndarray, dict]:
        if self.num_point != 2048:
            raise ValueError("fc_upconv decoder requires num_point == 2048")
        b = feat.shape[0]
        # FC branch -> 1024 points.
        x = FC(512, bn=True, dtype=self.dtype, name="fc1")(feat, train, bn_momentum)
        x = FC(512, bn=True, dtype=self.dtype, name="fc2")(x, train, bn_momentum)
        x = FC(1024 * 3, activation=None, dtype=self.dtype, name="fc3")(x)
        pc_fc = x.reshape(b, -1, 3)
        # Upconv branch: (1,1,512) -> 32x32 xyz map -> 1024 points.
        y = feat.reshape(b, 1, 1, 512)
        for i, (f, k, s) in enumerate(self._STAGES):
            y = UpConv(f, k, s, dtype=self.dtype, name=f"upconv{i + 1}")(
                y, train, bn_momentum
            )
        y = UpConv(3, (1, 1), (1, 1), bn=False, activation=None,
                   dtype=self.dtype, name="upconv5")(y)
        xyzmap = y  # (B, 32, 32, 3)
        pc_upconv = y.reshape(b, -1, 3)
        # Set union (tf.concat axis=1, model_fc_upconv.py:90).
        return jnp.concatenate([pc_fc, pc_upconv], axis=1), {"xyzmap": xyzmap}


class HierarchicalDecoder(nn.Module):
    """Two-stage decoder: 64 center points with features, then num_point/64
    local offsets per center translated to global coordinates
    (model_hierachy.py:75-88). Requires num_point % 64 == 0."""

    num_point: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool, bn_momentum) -> Tuple[jnp.ndarray, dict]:
        if self.num_point % 64 != 0:
            raise ValueError("hierarchical decoder requires num_point % 64 == 0")
        b = feat.shape[0]
        per_group = self.num_point // 64
        # Stage 1: 64 centers (xyz + 256-d feature each).
        pc1_feat = FC(64 * 256, bn=True, dtype=self.dtype, name="fc1")(
            feat, train, bn_momentum
        ).reshape(b, 64, 256)
        pc1_xyz = FC(64 * 3, activation=None, dtype=self.dtype, name="fc1_xyz")(
            feat
        ).reshape(b, 64, 3)
        # Stage 2: per-center local offsets (the reference's conv1d layers are
        # per-center Dense layers, model_hierachy.py:81-83).
        pc2 = FC(256, bn=True, dtype=self.dtype, name="fc_conv1")(
            pc1_feat, train, bn_momentum
        )
        pc2_xyz = FC(per_group * 3, activation=None, dtype=self.dtype,
                     name="fc_conv3")(pc2)
        pc2_xyz = pc2_xyz.reshape(b, 64, per_group, 3)
        pc2_xyz = pc2_xyz + pc1_xyz[:, :, None, :]  # local -> global
        return pc2_xyz.reshape(b, self.num_point, 3), {"pc1_xyz": pc1_xyz}

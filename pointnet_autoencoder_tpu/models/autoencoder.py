"""Point-cloud autoencoder model assemblies.

Each config mirrors one of the reference's ``--model`` choices
(SURVEY.md section 2.4): the shared PointNet encoder, a config-specific
"neck" of FC layers, and a decoder family. The uniform contract replaces the
reference's three-module-function convention (placeholder_inputs / get_model
/ get_loss):

    apply(variables, points, train, bn_momentum) -> (pred, end_points)
    loss_fn(pred, label, end_points) -> (loss, metrics)

``end_points`` carries 'embedding' plus decoder extras ('xyzmap',
'pc1_xyz'), exactly the keys the reference exposes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointnet_autoencoder_tpu.nn.decoders import (
    FCDecoder,
    FCUpconvDecoder,
    HierarchicalDecoder,
    UpconvDecoder,
)
from pointnet_autoencoder_tpu.nn.encoder import PointNetEncoder
from pointnet_autoencoder_tpu.nn.layers import FC
from pointnet_autoencoder_tpu.ops import chamfer, emd

Array = jax.Array
EndPoints = Dict[str, Array]

# Decoder families by registry name. Shared by PointAutoencoder and by
# decoder-only application (InferenceSession.decode runs one of these
# standalone against the 'decoder' variable sub-tree).
DECODERS = {
    "fc": FCDecoder,
    "upconv": UpconvDecoder,
    "fc_upconv": FCUpconvDecoder,
    "hierarchy": HierarchicalDecoder,
}


class PointAutoencoder(nn.Module):
    """Encoder + neck + decoder. ``decoder`` selects the family; ``neck``
    lists the FC widths applied between encoder and decoder (the last neck
    output is the published embedding)."""

    num_point: int
    decoder: str = "fc"  # fc | upconv | fc_upconv | hierarchy
    neck: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points: Array, train: bool = True,
                 bn_momentum=0.9) -> Tuple[Array, EndPoints]:
        feat = PointNetEncoder(dtype=self.dtype, name="encoder")(
            points, train, bn_momentum
        )
        for i, width in enumerate(self.neck):
            feat = FC(width, bn=True, dtype=self.dtype, name=f"fc0{i}")(
                feat, train, bn_momentum
            )
        end_points: EndPoints = {"embedding": feat}
        dec_cls = DECODERS[self.decoder]
        pred, extras = dec_cls(self.num_point, dtype=self.dtype, name="decoder")(
            feat, train, bn_momentum
        )
        end_points.update(extras)
        return pred, end_points


# ---------------------------------------------------------------------------
# Loss functions (reference get_loss contracts)
# ---------------------------------------------------------------------------


def chamfer_x100_loss(chamfer_impl: Optional[str] = None):
    """loss = mean(d_fwd + d_bwd) * 100; metric 'pcloss' is the raw mean
    (models/model.py:77-83)."""

    def loss_fn(pred, label, end_points):
        pcloss = chamfer.chamfer_loss(pred, label, impl=chamfer_impl)
        metrics = {"pcloss": pcloss}
        return pcloss * 100.0, metrics

    return loss_fn


def emd_loss_fn(pred, label, end_points):
    """loss = mean_b EMD(label -> pred), unscaled; Chamfer still reported as
    the 'pcloss' metric (models/model_emd.py:79-89)."""
    pcloss = chamfer.chamfer_loss(pred, label)
    loss = emd.emd_loss(pred, label)
    return loss, {"pcloss": pcloss}


def hierarchy_loss_fn(pred, label, end_points):
    """loss = (chamfer(pred) + 0.1 * chamfer(centers)) * 100
    (models/model_hierachy.py:91-104). Note the center term sums the two
    directional means (mean over 64 + mean over N), as the reference does."""
    pcloss = chamfer.chamfer_loss(pred, label)
    d1, _, d2, _ = chamfer.nn_distance(end_points["pc1_xyz"], label)
    pc1_loss = jnp.mean(d1) + jnp.mean(d2)
    loss = (pcloss + 0.1 * pc1_loss) * 100.0
    return loss, {"pcloss": pcloss, "pc1loss": pc1_loss}


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """One ``--model`` config: module factory + loss + constraints."""

    name: str
    decoder: str
    neck: Tuple[int, ...]
    loss_fn: Callable[[Array, Array, EndPoints], Tuple[Array, Dict[str, Array]]]
    point_constraint: Optional[Callable[[int], bool]] = None
    constraint_msg: str = ""

    def make(self, num_point: int, dtype=jnp.float32) -> PointAutoencoder:
        if self.point_constraint and not self.point_constraint(num_point):
            raise ValueError(
                f"model {self.name!r}: num_point={num_point} invalid "
                f"({self.constraint_msg})"
            )
        return PointAutoencoder(
            num_point=num_point, decoder=self.decoder, neck=self.neck,
            dtype=dtype,
        )

    def init_variables(self, rng, num_point: int, batch_size: int = 2,
                       dtype=jnp.float32):
        model = self.make(num_point, dtype=dtype)
        dummy = jnp.zeros((batch_size, num_point, 3), jnp.float32)
        return model, model.init(rng, dummy, train=False, bn_momentum=0.9)

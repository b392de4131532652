"""Custom loss ops: Chamfer (nn_distance) and approximate EMD (approx_match).

TPU-native equivalents of the reference's CUDA ops
(tf_ops/nn_distance/tf_nndistance_g.cu, tf_ops/approxmatch/tf_approxmatch_g.cu):
dense-XLA implementations plus fused Pallas kernels, all wrapped in
jax.custom_vjp with the analytic backward passes the reference registers.
"""

from pointnet_autoencoder_tpu.ops.chamfer import nn_distance, chamfer_loss
from pointnet_autoencoder_tpu.ops.emd import (
    approx_match,
    emd_cost,
    emd_loss,
    match_cost,
)
from pointnet_autoencoder_tpu.ops.fused_head import (
    fused_dense_bn_relu_max,
    head_stats,
)

__all__ = [
    "nn_distance",
    "chamfer_loss",
    "approx_match",
    "match_cost",
    "emd_cost",
    "emd_loss",
    "fused_dense_bn_relu_max",
    "head_stats",
]

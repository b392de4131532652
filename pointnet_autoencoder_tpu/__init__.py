"""pointnet_autoencoder_tpu: a TPU-native point-cloud autoencoder framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
TensorFlow/CUDA implementation (jayantsharma/pointnet-autoencoder):

- PointNet encoder + {fc, upconv, fc_upconv, hierarchy} decoders
  (reference: models/*.py) built as batched matmuls for the MXU.
- Chamfer distance and approximate Earth-Mover's distance losses
  (reference: tf_ops/nn_distance, tf_ops/approxmatch) as jax.custom_vjp ops
  with fused Pallas TPU kernels and dense-XLA fallbacks.
- ShapeNetPart data pipeline (reference: part_dataset.py) with host-side
  numpy augmentation and prefetch.
- Training runtime (reference: train.py) with staircase LR / BN-momentum
  schedules, orbax checkpointing, and data-parallel execution over a
  jax.sharding.Mesh.
"""

__version__ = "0.1.0"

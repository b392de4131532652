"""Minimal library-level training loop (no CLI, no Trainer).

Shows the raw pieces a power user composes: model registry, schedules,
optimizer, jitted step, device-resident data. Run:

    python examples/minimal_train.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.data import synthetic
from pointnet_autoencoder_tpu.data.device_pipeline import (
    DeviceBatchIterator,
    DeviceDataset,
    assemble_batch,
)
from pointnet_autoencoder_tpu.data.shapenet_part import PartDataset
from pointnet_autoencoder_tpu.models.registry import get_model_spec
from pointnet_autoencoder_tpu.train import schedules
from pointnet_autoencoder_tpu.train.loop import make_step_fns
from pointnet_autoencoder_tpu.train.state import TrainState, make_optimizer

BATCH, NUM_POINT, EPOCHS = 8, 256, 5

# Data: a synthetic on-disk fixture, uploaded to device memory once.
root = synthetic.write_fixture(tempfile.mkdtemp(), shapes_per_category=40)
dataset = PartDataset(root, npoints=NUM_POINT, split="trainval",
                      class_choice=["Chair"], seed=0)
device_data = DeviceDataset(dataset)
batches = DeviceBatchIterator(device_data.num_shapes, BATCH, shuffle=True)

# Model + loss from the registry; reference schedules; one jitted step.
spec = get_model_spec("model")
model, variables = spec.init_variables(jax.random.PRNGKey(0), NUM_POINT,
                                       dtype=jnp.bfloat16)
lr = schedules.learning_rate_schedule(1e-3, 0.7, BATCH, 200000)
bn = schedules.bn_momentum_schedule(BATCH, 200000)
tx = make_optimizer("adam", lr)
state = TrainState.create(variables, tx)
train_step, _ = make_step_fns(model, spec, tx, bn, lr)

# The device-resident arrays are jit ARGUMENTS, not closure constants:
# a closed-over-constant gather graph produces wrong results on the
# axon-tunneled backend (CLAUDE.md gotchas; train/loop.py does the same).
@jax.jit
def step(state, data, lengths, idxs, key):
    batch = assemble_batch(data, lengths, idxs, key, NUM_POINT, rotate=True)
    return train_step(state, batch)

for epoch in range(EPOCHS):
    metrics = None
    for idxs, key in batches.epoch():
        state, metrics = step(state, device_data.data, device_data.lengths,
                              idxs, key)
    print(f"epoch {epoch}: loss={float(metrics['loss']):.4f} "
          f"chamfer={float(metrics['pcloss']):.4f}")

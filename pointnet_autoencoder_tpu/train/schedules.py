"""LR and BN-momentum staircase schedules.

Replicates the reference's observable behavior exactly (train.py:74-92):

- learning rate: base * decay_rate ** floor(step * batch_size / decay_step).
  The reference's 1e-5 floor is dead code (the clipped value is assigned to
  a typo'd variable, train.py:81) -- published behavior has NO floor, so
  neither does this by default; pass ``floor=1e-5`` to enable the intended
  clamp.
- bn_decay (the BatchNorm momentum): min(0.99, 1 - 0.5 * 0.5 **
  floor(step * batch_size / decay_step)), ramping 0.5 -> 0.99.

Both are pure jnp functions of the step so they trace into the jitted train
step (no retracing as they change).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

BN_INIT_DECAY = 0.5
BN_DECAY_RATE = 0.5
BN_DECAY_CLIP = 0.99


def staircase(base: float, rate: float, batch_size: int,
              decay_step: int) -> Callable:
    def fn(step):
        exponent = jnp.floor(
            step.astype(jnp.float32) * batch_size / decay_step
        )
        return jnp.asarray(base, jnp.float32) * jnp.power(
            jnp.asarray(rate, jnp.float32), exponent
        )

    return fn


def learning_rate_schedule(base_lr: float, decay_rate: float,
                           batch_size: int, decay_step: int,
                           floor: Optional[float] = None) -> Callable:
    stair = staircase(base_lr, decay_rate, batch_size, decay_step)

    def fn(step):
        step = jnp.asarray(step)
        lr = stair(step)
        if floor is not None:
            lr = jnp.maximum(lr, floor)
        return lr

    return fn


def bn_momentum_schedule(batch_size: int, decay_step: int) -> Callable:
    """Returns bn_decay(step): the moving-average momentum fed to BatchNorm."""
    stair = staircase(BN_INIT_DECAY, BN_DECAY_RATE, batch_size, decay_step)

    def fn(step):
        step = jnp.asarray(step)
        return jnp.minimum(BN_DECAY_CLIP, 1.0 - stair(step))

    return fn

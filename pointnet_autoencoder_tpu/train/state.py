"""Train state: parameters, BN moving stats, optimizer state, step.

The TPU-native equivalent of the reference's TF graph variables +
``batch = tf.Variable(0)`` global step (train.py:101) + Adam slots, as one
functional pytree threaded through the jitted step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array  # int32 global step (the reference's `batch` variable)
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )


def make_optimizer(name: str, lr_schedule: Callable,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    """'adam' or 'momentum', the reference's two choices (train.py:117-120).
    TF Adam defaults (b1=0.9, b2=0.999, eps=1e-8) and plain (non-Nesterov)
    momentum SGD."""
    if name == "adam":
        return optax.adam(lr_schedule, b1=0.9, b2=0.999, eps=1e-8)
    if name == "momentum":
        return optax.sgd(lr_schedule, momentum=momentum, nesterov=False)
    raise ValueError(f"unknown optimizer {name!r} (use 'adam' or 'momentum')")

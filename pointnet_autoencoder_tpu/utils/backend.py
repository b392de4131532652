"""Backend-selection helpers.

Hardware plugins (e.g. the axon TPU tunnel) can override JAX_PLATFORMS at
import time, so merely exporting ``JAX_PLATFORMS=cpu`` is not always enough
to get the CPU backend. ``honor_cpu_env_request`` pins the config knob when
the environment asked for cpu; it must run before anything initializes the
backend (jax.devices(), any jnp op).
"""

from __future__ import annotations

import os

import jax


def honor_cpu_env_request() -> None:
    """If JAX_PLATFORMS requests cpu first, force it via jax.config.

    No-op otherwise; harmless (but ineffective) after backend init.
    Used by the CLIs and the driver entry so
    ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N``
    reliably yields an N-device virtual CPU mesh for sharding work without
    TPU hardware (the same environment tests/conftest.py sets up).
    """
    want = [p.strip() for p in os.environ.get("JAX_PLATFORMS", "").split(",")
            if p.strip()]
    if want and want[0] == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

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


def enable_compilation_cache(cache_dir: str,
                             min_compile_time_secs: float | None = None
                             ) -> str:
    """Persist compiled executables across processes.

    Points JAX's persistent compilation cache at ``cache_dir`` so a
    restarted trainer/server reloads its compiled programs instead of
    recompiling them — the cold-start cost this framework documents
    (~2 min for the flagship train step; a serving warmup that outlasted
    client timeouts before PointServer learned to warm up first). On a
    bare TPU host this is the only cross-process compile cache; the
    development tunnel used here additionally caches server-side, so the
    measured local win there is smaller (docs/ARCHITECTURE.md records
    both numbers).

    ``min_compile_time_secs`` overrides JAX's write threshold (default
    ~1 s: only compiles that cost real time are persisted). Safe to call
    before or after backend init; returns the absolute cache path.
    """
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if min_compile_time_secs is not None:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_secs))
    return cache_dir


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

"""utils/backend helpers: persistent-compilation-cache enablement."""

import os

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.utils.backend import enable_compilation_cache


def test_enable_compilation_cache_populates(tmp_path):
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        path = enable_compilation_cache(
            str(tmp_path / "xla_cache"), min_compile_time_secs=0.0
        )
        assert os.path.isdir(path)
        # CPU-backend compiles are tiny; drop the size threshold too so the
        # entry is actually written.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

        @jax.jit
        def _cache_probe_fn(x):
            return jnp.tanh(x) @ x.T

        jax.block_until_ready(_cache_probe_fn(jnp.ones((64, 64), jnp.float32)))
        assert os.listdir(path), "no compilation-cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", prev_size
        )

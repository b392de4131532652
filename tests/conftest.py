"""Test configuration: force an 8-device virtual CPU backend.

Multi-device behavior (data-parallel sharding, cross-device BN stats) is
tested on fake CPU devices -- the JAX-idiomatic substitute for a real
multi-chip slice -- per SURVEY.md section 4. Must run before jax initializes
its backend, hence the env mutation at import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The host environment may pin JAX_PLATFORMS to a hardware plugin (e.g. the
# axon TPU tunnel) in a way that survives the env override above; force the
# config knob too, before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

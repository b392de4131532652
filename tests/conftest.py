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

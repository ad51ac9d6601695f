"""Test configuration: force jax-CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices (SURVEY.md §4:
"works under --xla_force_host_platform_device_count for CPU CI"); the real
TPU is exercised by bench.py and the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize pins JAX_PLATFORMS=axon during registration;
# the config update below wins regardless of env ordering.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

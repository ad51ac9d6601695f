"""Test configuration: force jax-CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices (SURVEY.md §4:
"works under --xla_force_host_platform_device_count for CPU CI"); the real
TPU is exercised by bench.py and the driver's compile checks.
"""

import os
import sys


def _tpu_only_invocation() -> bool:
    """True when every positional pytest arg targets tests/tpu.

    `python -m pytest tests/tpu/ -q` on a TPU host must run on the real
    device; a mixed or whole-tree run pins CPU and the tpu tests skip.
    """
    # Only args that name real paths count: bare option values like the
    # `no:cacheprovider` in `-p no:cacheprovider` don't start with `-`
    # but aren't test paths (this mis-pinned CPU and skipped the whole
    # tpu suite under the round-3 validation queue).
    paths = [a for a in sys.argv[1:]
             if not a.startswith("-")
             and os.path.exists(a.split("::")[0])]
    return bool(paths) and all(
        "tpu" in p.replace("\\", "/").split("/") or "tests/tpu" in p
        for p in paths)


if os.environ.get("MPT_TEST_PLATFORM", "") not in ("tpu", "axon") \
        and not _tpu_only_invocation():
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

    # The image's sitecustomize pins JAX_PLATFORMS=axon during registration;
    # the config update below wins regardless of env ordering.
    import jax

    jax.config.update("jax_platforms", "cpu")

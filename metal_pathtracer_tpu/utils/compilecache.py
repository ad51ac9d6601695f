"""Persistent XLA compilation cache.

The shared axon tunnel's compile times vary wildly (20s-3min for the same
Pallas kernel); caching serialized executables on disk makes every entry
point after the first run pay ~0. Must be called BEFORE the first jit
trace (importing jax is fine).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def _runtime_salt() -> str:
    """Identity of the backend runtime, mixed into the cache path.

    The shared tunnel's worker process gets swapped/upgraded without
    notice, and executables serialized under the previous toolchain can
    FAULT the new worker (observed 2026-08-17: every pre-swap cached
    frame variant crashed the TPU worker; freshly compiled ones ran
    fine). The platform cache key does not capture this, so salt the
    directory with the backend's platform_version: a worker swap then
    misses cleanly instead of replaying poisoned binaries."""
    try:
        import hashlib

        import jax

        ver = jax.extend.backend.get_backend().platform_version
        return hashlib.sha256(str(ver).encode()).hexdigest()[:12]
    except Exception:
        return "v0"


def enable_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "MPT_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    if cache_dir in ("", "0", "off"):
        return
    import jax

    cache_dir = os.path.join(cache_dir, _runtime_salt())
    os.makedirs(cache_dir, exist_ok=True)

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax: env-var path only
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

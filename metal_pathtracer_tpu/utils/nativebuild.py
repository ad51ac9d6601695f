"""Build the native helpers on demand.

The .so binaries are not committed (ADVICE r01: prebuilt -march=native
binaries are non-portable and unverifiable); they are compiled from
native/*.cpp on first use, on the machine that runs them. Pure-python
fallbacks exist for every native component (numpy SAH builder; the oracle
backend degrades to CpuJaxBackend with a warning).
"""

from __future__ import annotations

import os
import subprocess
import threading

_NATIVE_DIR = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native"))
_lock = threading.Lock()
_attempted = False


def native_dir() -> str:
    return _NATIVE_DIR


def lib_path(name: str) -> str:
    return os.path.join(_NATIVE_DIR, name)


def ensure_built(name: str) -> str | None:
    """Return the path to native/<name>, building via build.sh if missing.

    Build is attempted at most once per process; returns None when the
    library is absent and cannot be built (no compiler / build failure).
    """
    global _attempted
    path = lib_path(name)
    if os.path.exists(path):
        return path
    with _lock:
        if os.path.exists(path):
            return path
        if _attempted:
            return None
        _attempted = True
        script = os.path.join(_NATIVE_DIR, "build.sh")
        if not os.path.exists(script):
            return None
        try:
            subprocess.run(["bash", script], cwd=_NATIVE_DIR, check=True,
                           capture_output=True, timeout=300)
        except Exception:
            return None
    return path if os.path.exists(path) else None

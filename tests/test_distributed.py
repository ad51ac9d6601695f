"""Multi-host (2-process jax.distributed) dryrun over DCN-style process
groups — tests the parallel/mesh.py:10-12 claim that the shard_map path
works unchanged after `jax.distributed.initialize()` (VERDICT r04
missing #5). Each process owns 2 virtual CPU devices; the 4-device
global-mesh render must match a single-device render bit-exactly
(absolute pixel/sample RNG seeding, SURVEY.md §5.8)."""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_dryrun():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # the coordination service is its own channel; keep it off any
    # proxies that may be configured in CI images
    env.pop("http_proxy", None)
    env.pop("https_proxy", None)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tools", "dist_dryrun.py"),
             f"--coordinator=127.0.0.1:{port}",
             "--num-processes=2", f"--process-id={pid}"],
            env=env, cwd=_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed dryrun timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DIST_DRYRUN_OK process={pid}" in out, out

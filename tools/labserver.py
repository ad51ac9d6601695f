"""Persistent TPU experiment server.

Keeping one process alive amortizes jax/libtpu init (~20s) and keeps
compiled kernels + device arrays in shared globals across experiments —
measured ~20x faster iteration than one-process-per-measurement.

Run:    python tools/labserver.py &
Submit: write a python file to /tmp/lab_jobs/<name>.py; the server execs
        it into a SHARED globals dict (so jobs can stash arrays/compiled
        fns for later jobs), captures stdout/stderr + traceback, and
        writes <name>.out next to it, then renames the job to <name>.done.
Stop:   write /tmp/lab_jobs/STOP
"""

import faulthandler
import io
import os
import signal
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout

# `kill -USR1 <pid>` dumps all thread stacks to stderr (hang diagnosis)
faulthandler.register(signal.SIGUSR1, all_threads=True)

JOBS = "/tmp/lab_jobs"
os.makedirs(JOBS, exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metal_pathtracer_tpu.utils.compilecache import enable_cache  # noqa: E402

enable_cache()

import jax  # noqa: E402

G = {"jax": jax, "__name__": "__lab__"}
print(f"[lab] ready devices={jax.devices()}", flush=True)

while True:
    if os.path.exists(os.path.join(JOBS, "STOP")):
        os.remove(os.path.join(JOBS, "STOP"))
        print("[lab] stopping", flush=True)
        break
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(0.25)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    with open(path) as f:
        src = f.read()
    # fresh repo code per job (keeps the long-lived TPU client, drops stale
    # modules); compiled executables persist in the on-disk jax cache
    for mod in [m for m in list(sys.modules)
                if m.startswith("metal_pathtracer_tpu")]:
        del sys.modules[mod]
    # stream output live to .partial so hung jobs show their progress
    buf = open(path[:-3] + ".partial", "w", buffering=1)
    t0 = time.time()
    try:
        with redirect_stdout(buf), redirect_stderr(buf):
            exec(compile(src, name, "exec"), G)
        status = "ok"
    except Exception:
        buf.write(traceback.format_exc())
        status = "error"
    buf.close()
    with open(path[:-3] + ".partial") as f:
        out = f.read()
    with open(path[:-3] + ".out", "w") as f:
        f.write(f"# status={status} elapsed={time.time() - t0:.2f}s\n" + out)
    os.remove(path[:-3] + ".partial")
    os.rename(path, path[:-3] + ".done")
    print(f"[lab] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)

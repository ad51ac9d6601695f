#!/usr/bin/env bash
# Wait for the axon TPU tunnel to come back, then run the queued
# validation serially (one TPU client at a time — two concurrent clients
# crashed the worker once). Logs land in /tmp/q_*.log.
#
# nohup bash tools/tpu_queue.sh > /tmp/q_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

echo "[queue] waiting for TPU tunnel ($(date))"
until probe; do
    sleep 120
done
echo "[queue] tunnel is back ($(date))"

echo "[queue] 1/4 bench sanity (fresh process)"
timeout 3000 python bench.py > /tmp/q_bench.json 2> /tmp/q_bench.log
echo "[queue] bench rc=$?"

echo "[queue] 2/4 TPU kernel suite"
timeout 5400 python -m pytest tests/tpu/ -q -p no:cacheprovider \
    > /tmp/q_tpu.log 2>&1
echo "[queue] tpu suite rc=$?"

echo "[queue] 3/4 bf16 microbench"
timeout 1200 python tools/microbench_bf16.py > /tmp/q_bf16.log 2>&1
echo "[queue] bf16 rc=$?"

echo "[queue] 4/4 lambert secondary series"
timeout 3000 python bench.py --scene lambert --no-selfcheck \
    > /tmp/q_lambert.json 2> /tmp/q_lambert.log
echo "[queue] lambert rc=$?"
echo "[queue] done ($(date))"

"""Measure the real SMEM node ceiling of the packet-trace kernel on-chip.

VERDICT r04 weak #6: the bench mesh builds 14,975 nodes against
NODE_BUDGET=15000 with no measured basis for the budget. The traversal
kernel's node arrays ride as scalar prefetch into SMEM:

- 8-wide tree (the production path): wnode_cbounds (48,W) f32 +
  wnode_child (8,W) i32 = 224 B per wnode (W ~ nodes/5),
- plus fixed scratch (~52 KB: stack, queues, 3x16KB tri_buf, verdicts).

This tool builds random soups of growing size with MPT_NODE_BUDGET
lifted, runs packet_trace compiled on the attached TPU, and reports
node/wnode counts, estimated SMEM bytes, and compile/run status — the
measured ceiling becomes the documented NODE_BUDGET basis.

Usage:  python tools/smemcap.py [tri_counts...]
"""

import os
import sys
import time

os.environ.setdefault("MPT_NODE_BUDGET", "1000000")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(tri_counts):
    import jax
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh

    rng = np.random.default_rng(7)
    # compile success is the question, not throughput: a handful of
    # packets suffices (128K random rays over a clustered soup measured
    # ~20 min/size — every packet's union is the whole tree)
    N = int(os.environ.get("SMEMCAP_RAYS", str(8 * 1024)))
    o = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    print(f"devices: {jax.devices()}")
    for T in tri_counts:
        # clustered soup => deep tree (more nodes per tri than a uniform
        # soup; mimics real meshes)
        c = rng.uniform(-10, 10, (T // 8, 3)).repeat(8, 0)[:T]
        v0 = (c + rng.uniform(-0.1, 0.1, (T, 3))).astype(np.float32)
        v1 = v0 + rng.uniform(-0.1, 0.1, (T, 3)).astype(np.float32)
        v2 = v0 + rng.uniform(-0.1, 0.1, (T, 3)).astype(np.float32)
        bvh = build_packet_bvh(v0, v1, v2)
        smem = (bvh.n_wnodes * 224 + 52 * 1024)
        line = (f"tris={T} nodes={bvh.n_nodes} wnodes={bvh.n_wnodes} "
                f"chunks={bvh.n_chunks} est_smem={smem / 1024:.0f}KB")
        try:
            t0 = time.time()
            t, tri, _, _ = packet_trace(oj, dj, 1e-3, 3e38, bvh)
            jnp.sum(t).block_until_ready()
            compile_s = time.time() - t0
            t0 = time.time()
            t, tri, _, _ = packet_trace(oj, dj, 1e-3, 3e38, bvh)
            hits = float(jnp.mean((tri >= 0).astype(jnp.float32)))
            jnp.sum(t).block_until_ready()
            run_s = time.time() - t0
            print(f"{line} OK compile={compile_s:.1f}s run={run_s * 1e3:.0f}ms "
                  f"hit%={hits * 100:.1f}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"{line} FAIL: {msg}", flush=True)
            return


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [
        500_000, 1_000_000, 2_000_000, 3_000_000, 4_000_000, 6_000_000]
    run(counts)

#!/usr/bin/env python
"""Chunk-demand granularity analysis: is per-row sub-packet traversal
worth building?

The packet kernel pays the UNION of its 1024 lanes' leaf-chunk demand
(every gated 32-slot group is MT-tested against all lanes; BENCHMARKS.md
"Where the time goes"). A per-row redesign (8 independent 128-lane
sub-packets sharing the (8,128) VPU footprint, per-row stacks, per-row
chunks in the sublane dim) would pay ~max-over-rows demand instead.
This tool measures, on the real bench BVH and real bounce wavefronts:

    per-ray demand  <=  per-row union  <=  packet union

where "demand" for a ray is the set of leaf chunks whose AABB the ray
enters closer than its committed hit (the chunks any traversal order
must test). Reported per lane order (tile order = pre-compaction
depth-1 bounce; octmorton = the compaction order deeper depths see).

The packet-union : max-row-union ratio bounds the sub-packet redesign's
MT+slab win; the row-sum : packet ratio gives its DMA-traffic cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from metal_pathtracer_tpu.utils.compilecache import enable_cache

enable_cache()


def main():
    import jax
    import jax.numpy as jnp

    from tools.abbench import build_bench_scene, make_kernel_loads
    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace_unsorted

    scene, uniforms, static = build_bench_scene()
    bvh = scene.tri_packet
    aabb = jnp.asarray(bvh.chunk_aabb)            # (NC, 6)
    nc = int(aabb.shape[0])
    print(f"chunks: {nc}", flush=True)

    os.environ["AB_LOADS"] = "primary,bounce-real"
    loads = make_kernel_loads(scene, static, uniforms)

    n_packets = int(os.environ.get("RU_PACKETS", "48"))
    rng = np.random.default_rng(11)

    @jax.jit
    def demand_counts(o, d, tcommit):
        """(1024,3) rays -> per-ray chunk-demand bool (1024, NC)."""
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                              jnp.where(d >= 0, 1e-20, -1e-20), d)
        lo = (aabb[None, :, :3] - o[:, None, :]) * inv[:, None, :]
        hi = (aabb[None, :, 3:] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.minimum(lo, hi).max(-1)
        tf = jnp.maximum(lo, hi).min(-1)
        tn = jnp.maximum(tn, 1e-3)
        tf = jnp.minimum(tf, tcommit[:, None])
        return tf >= tn                            # (1024, NC)

    @jax.jit
    def sort_octmorton(o, d, alive):
        octant = ((d[:, 0] < 0).astype(jnp.uint32)
                  | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] < 0).astype(jnp.uint32) << 2))

        def q8(v):
            lo = jnp.min(jnp.where(alive, v, jnp.inf))
            hi = jnp.max(jnp.where(alive, v, -jnp.inf))
            t = (v - lo) / jnp.maximum(hi - lo, 1e-20)
            return jnp.clip(t * 255.0, 0.0, 255.0).astype(jnp.uint32)

        def part1by2(x):
            x = (x | (x << 16)) & jnp.uint32(0xFF0000FF)
            x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
            x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
            x = (x | (x << 2)) & jnp.uint32(0x09249249)
            return x

        morton = (part1by2(q8(o[:, 0])) | (part1by2(q8(o[:, 1])) << 1)
                  | (part1by2(q8(o[:, 2])) << 2))
        dead = jnp.logical_not(alive).astype(jnp.uint32)
        key = (dead << 31) | (octant << 28) | morton
        return jnp.argsort(key)

    for label, o, d, tmax, any_hit in loads:
        tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32),
                                    (o.shape[0],))
        t, tri, _, _, totals = packet_trace_unsorted(
            o, d, 1e-3, tmax_arr, bvh, any_hit=any_hit, return_stats=True)
        n_pkts = o.shape[0] / 1024.0
        print(f"{label:12s} KERNEL  chunks/packet "
              f"{float(np.asarray(totals['leaf_chunks_tested'])) / n_pkts:7.1f}  "
              f"nodes/packet "
              f"{float(np.asarray(totals['nodes_visited'])) / n_pkts:7.1f}  "
              f"prim-slots/packet "
              f"{float(np.asarray(totals['leaf_prim_tests'])) / n_pkts:7.1f}",
              flush=True)
        # committed hit t (misses keep tmax -> demand = every entered chunk)
        tc = jnp.where(tri >= 0, t, tmax_arr)
        alive = tmax_arr > 1e-3

        for order in ("tile", "octmorton"):
            if order == "octmorton":
                perm = sort_octmorton(o, d, alive)
                oo, dd, tt = o[perm], d[perm], tc[perm]
                aa = alive[perm]
            else:
                oo, dd, tt, aa = o, d, tc, alive
            n = oo.shape[0]
            starts = rng.choice(n // 1024, size=n_packets, replace=False)
            per_ray, row_union, row_max, pkt_union, row_sum = [], [], [], [], []
            for s in starts:
                sl = slice(int(s) * 1024, (int(s) + 1) * 1024)
                w = demand_counts(oo[sl], dd[sl], jnp.where(aa[sl], tt[sl],
                                                            0.0))
                w = np.asarray(w)
                per_ray.append(w.sum(1).mean())
                rows = w.reshape(8, 128, -1).any(1)   # (8, NC) row unions
                ru = rows.sum(1)
                row_union.append(ru.mean())
                row_max.append(ru.max())
                row_sum.append(ru.sum())
                pkt_union.append(w.any(0).sum())
            print(f"{label:12s} {order:9s} per-ray {np.mean(per_ray):7.2f}  "
                  f"row-union {np.mean(row_union):7.1f}  "
                  f"row-max {np.mean(row_max):7.1f}  "
                  f"pkt-union {np.mean(pkt_union):7.1f}  "
                  f"row-sum(DMA) {np.mean(row_sum):7.1f}  "
                  f"win={np.mean(pkt_union)/max(np.mean(row_max),1e-9):.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()

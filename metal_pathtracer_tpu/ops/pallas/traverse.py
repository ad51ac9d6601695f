"""Packet BVH traversal kernel (the hot op of the framework).

One grid step traces a 1024-ray packet through the chunked SAH tree
(scene/packetbvh.py). TPU-shaped design decisions, each measured:

- rays travel in 1024-wide packets sharing a scalar traversal stack in
  SMEM — the lane-parallel replacement for the reference's per-thread
  128-entry stack (reference: pathtrace.metal:36, 1733-2384);
- **batched descend decisions**: a vector->scalar sync (`jnp.any`) costs
  microseconds on TPU, so per-node "did any ray hit this box?" verdicts
  are accumulated into lanes of a VMEM vector (iota-masked writes) for up
  to 64 candidates per wave and transferred to SMEM with ONE DMA; the
  scalar unit then pushes survivors. This is ~50x faster than per-node
  reductions;
- leaf chunks (256 dense triangle slots) DMA HBM->SMEM; 8 sub-chunk
  AABBs are verdict-batched the same way and surviving 32-slot groups are
  tested triangle-by-triangle against the whole packet (Moller-Trumbore
  with precomputed edges; reference math: pathtrace.metal:544-592).

Packets inherit ray coherence from the renderer's 8x128 pixel tiles
(renderer/frame.py). The kernel is triangle-test bound (~40ns per
gated slot group tested against all 1024 lanes); XLA-side bounce-ray
sorting and octant-masked passes were both measured LOSSES with honest
timing (BENCHMARKS.md) — the next lever is in-kernel ray->chunk binning.
"""

from __future__ import annotations

import functools
import os

# dev bisection: MPT_TRAVERSE_DEBUG="leaf" skips leaf tests, "all" stubs
# the kernel. Read at CALL time and threaded into the jit cache key as a
# static arg — a module-level read froze at import and silently no-op'd
# (the round-2 "glue dominates" mismeasurement).

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_pathtracer_tpu.scene.packetbvh import (
    CHUNK,
    PLANES,
    SUBCHUNKS,
    PacketBvh,
)

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES   # rays per packet
# Live stack entries are bounded by the leaf count of the tree cut plus one
# wave of children; packetbvh caps leaves via NODE_BUDGET, so 16K is safe.
STACK_DEPTH = 16384
WAVE = 32                  # stack entries popped per wave
MAX_CAND = 2 * WAVE        # candidate children per wave (<= LANES)
LEAF_QUEUE = 128           # leaf chunks queued per wave (8-wide worst case)


def _kernel(n_nodes: int, t_min: float, any_hit: bool, n_passes: int,
            wide: bool, _DEBUG_SKIP: str, group: int, wwave: int,
            nb, nm,
            ox, oy, oz, dx, dy, dz, tmax, excl,
            chunks,
            out_t, out_tri, out_u, out_v, out_stats,
            stack, cand, leafq, verdict_smem, tri_buf, sem, vsem, wsem,
            bt_ref, btri_ref, bu_ref, bv_ref, verdict_vmem, wt_ref,
            presence_smem, counters):
    if _DEBUG_SKIP == "all":
        out_t[:] = tmax[:]
        out_tri[:] = jnp.full((group * SUBLANES, LANES), -1, jnp.int32)
        out_u[:] = tmax[:]
        out_v[:] = tmax[:]
        out_stats[:] = jnp.zeros((group * SUBLANES, LANES), jnp.float32)
        return
    if _DEBUG_SKIP == "fakehit":
        # every alive lane reports a synthetic hit on tri 0 at t=1: keeps
        # the integrator's bounce loop fully populated with ~zero kernel
        # cost — isolates shading/glue cost from traversal cost
        alive = tmax[:] > t_min
        out_t[:] = jnp.where(alive, 1.0, tmax[:])
        out_tri[:] = jnp.where(alive, 0, -1)
        out_u[:] = jnp.full(tmax.shape, 0.3, jnp.float32)
        out_v[:] = jnp.full(tmax.shape, 0.3, jnp.float32)
        out_stats[:] = jnp.zeros(tmax.shape, jnp.float32)
        return

    # Several packets per grid step (MPT_GROUP). Honest timing showed
    # per-grid-step overhead is ~0 (a stubbed kernel measures exactly the
    # host dispatch floor), so the default is 1 — larger groups only
    # multiply Mosaic compile time.
    for g in range(group):
        sl = slice(g * SUBLANES, (g + 1) * SUBLANES)
        _packet_body(n_nodes, t_min, any_hit, n_passes, wide, _DEBUG_SKIP,
                     wwave,
                     nb, nm,
                     ox[sl], oy[sl], oz[sl], dx[sl], dy[sl], dz[sl],
                     tmax[sl], excl[sl], chunks,
                     out_t, out_tri, out_u, out_v, out_stats, sl,
                     stack, cand, leafq, verdict_smem, tri_buf, sem, vsem,
                     wsem,
                     bt_ref, btri_ref, bu_ref, bv_ref, verdict_vmem, wt_ref,
                     presence_smem, counters)


def _packet_body(n_nodes, t_min, any_hit, n_passes, wide, _DEBUG_SKIP,
                 wwave, nb, nm,
                 ox, oy, oz, dx, dy, dz, tmax, excl,
                 chunks,
                 out_t, out_tri, out_u, out_v, out_stats, sl,
                 stack, cand, leafq, verdict_smem, tri_buf, sem, vsem, wsem,
                 bt_ref, btri_ref, bu_ref, bv_ref, verdict_vmem, wt_ref,
                 presence_smem, counters):
    """Trace ONE (8,128) packet; ray inputs are jnp values (pre-sliced),
    outputs written to the `sl` rows of the out refs."""
    inv_dx = 1.0 / jnp.where(jnp.abs(dx[:]) < 1e-20,
                             jnp.where(dx[:] >= 0, 1e-20, -1e-20), dx[:])
    inv_dy = 1.0 / jnp.where(jnp.abs(dy[:]) < 1e-20,
                             jnp.where(dy[:] >= 0, 1e-20, -1e-20), dy[:])
    inv_dz = 1.0 / jnp.where(jnp.abs(dz[:]) < 1e-20,
                             jnp.where(dz[:] >= 0, 1e-20, -1e-20), dz[:])

    _bx = lambda b: (b - ox[:]) * inv_dx
    _by = lambda b: (b - oy[:]) * inv_dy
    _bz = lambda b: (b - oz[:]) * inv_dz

    bt_ref[:] = tmax[:]
    btri_ref[:] = jnp.full(tmax.shape, -1.0, jnp.float32)
    bu_ref[:] = jnp.zeros(tmax.shape, jnp.float32)
    bv_ref[:] = jnp.zeros(tmax.shape, jnp.float32)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # --- octant-masked multi-pass setup ---------------------------------
    # Divergent (bounce) packets pay the traversal union of all 1024 rays;
    # splitting the packet into direction-octant passes bounds each pass's
    # union to same-heading rays — per-ray results are unchanged (each ray
    # participates in exactly one pass), no reordering, no gathers.
    # Coherent packets are octant-pure: the other passes are skipped at the
    # root via the batched presence verdict below.
    alive = tmax[:] > t_min
    if n_passes == 8:
        octant = ((dx[:] < 0.0).astype(jnp.int32)
                  + 2 * (dy[:] < 0.0).astype(jnp.int32)
                  + 4 * (dz[:] < 0.0).astype(jnp.int32))
        presence = jnp.full((1, LANES), -1.0, jnp.float32)
        for k in range(8):
            member = jnp.max(jnp.where(alive & (octant == k), 1.0, -1.0),
                             keepdims=True).reshape(1, 1)
            presence = jnp.where(lane_iota == k, member, presence)
        verdict_vmem[0:1, :] = presence
        pdma = pltpu.make_async_copy(verdict_vmem,
                                     verdict_smem.at[pl.ds(0, 2)], vsem)
        pdma.start()
        pdma.wait()
        # SMEM copy: verdict_smem gets overwritten inside the pass loop
        for k in range(8):
            presence_smem[k] = jnp.where(verdict_smem[0, k] >= 0.0, 1, 0)

    def slab_test(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz):
        """-> (margin, entry): (1,1) vectors. margin = max over rays of
        (tfar - tnear) (>=0 means some ray hits); entry = min over hitting
        rays of tnear (for near-first child ordering)."""
        t0x = _bx(bminx)
        t1x = _bx(bmaxx)
        t0y = _by(bminy)
        t1y = _by(bmaxy)
        t0z = _bz(bminz)
        t1z = _bz(bmaxz)
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), wt_ref[:]))
        hit = tfar >= tnear
        margin = jnp.max(tfar - tnear, keepdims=True).reshape(1, 1)
        entry = jnp.min(jnp.where(hit, tnear, jnp.float32(3.0e38)),
                        keepdims=True).reshape(1, 1)
        return margin, entry

    def slab_margin_rows(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz):
        """Per-sublane-row margins (8,1): the lane-only reduce (7 log
        steps) replaces the full (8,128)->scalar reduce (10); callers
        column-place the rows and run ONE sublane reduce per wave —
        identical final margins, ~3 fewer ops per candidate."""
        t0x = _bx(bminx)
        t1x = _bx(bmaxx)
        t0y = _by(bminy)
        t1y = _by(bmaxy)
        t0z = _bz(bminz)
        t1z = _bz(bmaxz)
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), wt_ref[:]))
        return jnp.max(tfar - tnear, axis=1, keepdims=True)


    def flush_verdicts():
        """verdict_vmem lanes -> verdict_smem rows 0-1 (single DMA; rows
        2-3 are the pipelined leaf-drain banks)."""
        dma = pltpu.make_async_copy(verdict_vmem,
                                    verdict_smem.at[pl.ds(0, 2)], vsem)
        dma.start()
        dma.wait()

    def leaf_dma(i, slot):
        cid = leafq[jnp.minimum(i, LEAF_QUEUE - 1)]
        return pltpu.make_async_copy(chunks.at[cid], tri_buf.at[slot],
                                     sem.at[slot])

    def leaf_verdicts(slot, bank):
        """Sub-chunk verdicts for the chunk in tri_buf[slot] -> START a
        flush into verdict_smem row `bank` (NOT waited — the caller
        overlaps the previous chunk's triangle tests with this DMA).

        Empty groups are gated by the explicit valid flag (plane 9 lane
        48+k): an "inverted box" does NOT fail this slab test — the
        per-axis min/max re-sorts the interval — so without the flag
        every empty group was MT-tested (measured 61% wasted MT work).
        """
        acc8 = jnp.full(tmax.shape, -1.0, jnp.float32)
        for k in range(SUBCHUNKS):
            base = k * 6
            rowm = slab_margin_rows(
                tri_buf[slot, 9, base + 0], tri_buf[slot, 9, base + 1],
                tri_buf[slot, 9, base + 2], tri_buf[slot, 9, base + 3],
                tri_buf[slot, 9, base + 4], tri_buf[slot, 9, base + 5])
            rowm = jnp.where(
                tri_buf[slot, 9, 6 * SUBCHUNKS + k] > 0.5, rowm, -1.0)
            acc8 = jnp.where(lane_iota == k, rowm, acc8)
        acc = jnp.max(acc8, axis=0, keepdims=True)
        # row 1: row 0 may carry a wave-verdict DMA still in flight when
        # the drain runs inside the deferred-drain window (wave pipelining)
        verdict_vmem[1:2, :] = acc
        dma = pltpu.make_async_copy(verdict_vmem.at[pl.ds(1, 1)],
                                    verdict_smem.at[pl.ds(bank, 1)], vsem)
        dma.start()
        return dma

    def process_leaf(slot, bank):
        group = CHUNK // SUBCHUNKS

        def tri_body(j, _):
            v0x = tri_buf[slot, 0, j]
            v0y = tri_buf[slot, 1, j]
            v0z = tri_buf[slot, 2, j]
            e1x = tri_buf[slot, 3, j]
            e1y = tri_buf[slot, 4, j]
            e1z = tri_buf[slot, 5, j]
            e2x = tri_buf[slot, 6, j]
            e2y = tri_buf[slot, 7, j]
            e2z = tri_buf[slot, 8, j]
            tri_id = tri_buf[slot, 10, j]
            valid_slot = tri_buf[slot, 11, j]

            pvx = dy[:] * e2z - dz[:] * e2y
            pvy = dz[:] * e2x - dx[:] * e2z
            pvz = dx[:] * e2y - dy[:] * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
            tvx = ox[:] - v0x
            tvy = oy[:] - v0y
            tvz = oz[:] - v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx[:] * qvx + dy[:] * qvy + dz[:] * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            take = ((jnp.abs(det) >= 1e-8)
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (t >= t_min) & (t < wt_ref[:])
                    & (valid_slot > 0.5)
                    & (tri_id != excl[:]))
            if any_hit:
                # shadow semantics: any hit in (t_min, tmax) occludes.
                # Collapsing the ray's search window to zero removes it
                # from every later slab-test union, so shadow packets
                # drain the stack early (reference anyHitOnly=true,
                # pathtrace.metal shadow-early-exit stats).
                wt_ref[:] = jnp.where(take, 0.0, wt_ref[:])
            else:
                wt_ref[:] = jnp.where(take, t, wt_ref[:])
            btri_ref[:] = jnp.where(take, tri_id, btri_ref[:])
            if not any_hit:
                # shadow semantics return no barycentrics (the public
                # contract: "u/v meaningless with any_hit") — skipping the
                # commits trims 2 selects per MT slot
                bu_ref[:] = jnp.where(take, u, bu_ref[:])
                bv_ref[:] = jnp.where(take, v, bv_ref[:])
            return 0

        if "mtskip" in _DEBUG_SKIP:
            # measurement mode: full traversal + leaf DMAs + verdicts, MT
            # tests skipped — isolates DMA/verdict cost from MT compute
            return
        for k in range(SUBCHUNKS):
            gate = verdict_smem[bank, k] >= 0.0

            @pl.when(gate)
            def _():
                # static unroll: the 8 slots' scalar load chains are
                # independent, so Mosaic pipelines them instead of paying
                # fori trip management per slot
                for r in range(group):
                    tri_body(k * group + r, 0)
                # leaf prim tests (reference avgLeafPrimTests,
                # MetalRenderer.mm:1168-1347): slots actually MT-tested
                counters[3] = counters[3] + group

    def drain_leaves(n_leaf):
        """Two-deep pipelined leaf drain. At step i three things overlap:
        chunk i+1's 16KB HBM->SMEM DMA (3-slot tri_buf), chunk i's verdict
        flush (banks = verdict_smem rows 2/3), and chunk i-1's triangle
        tests — both DMA latencies hide behind the MT work (the serial
        start/wait chain measured as the dominant leaf-phase cost).
        Chunk i's verdicts use the hit window BEFORE chunk i-1's commits —
        purely conservative (a group can only pass extra, never be
        missed); MT commits themselves stay in queue order, so per-ray
        results are bit-identical to the serial drain."""
        @pl.when(n_leaf > 0)
        def _():
            leaf_dma(0, 0).start()

            def body(i, _):
                @pl.when(i < n_leaf)
                def _():
                    @pl.when(i + 1 < n_leaf)
                    def _():
                        leaf_dma(i + 1, jax.lax.rem(i + 1, 3)).start()

                    leaf_dma(i, jax.lax.rem(i, 3)).wait()
                    leaf_verdicts(jax.lax.rem(i, 3),
                                  2 + jax.lax.rem(i, 2))

                @pl.when(i > 0)
                def _():
                    process_leaf(jax.lax.rem(i + 2, 3),
                                 2 + jax.lax.rem(i + 1, 2))

                # the flush started above lands while the previous chunk's
                # triangles were testing; wait before the next step reuses
                # the verdict vmem row / this bank
                @pl.when(i < n_leaf)
                def _():
                    pltpu.make_async_copy(
                        verdict_vmem.at[pl.ds(1, 1)],
                        verdict_smem.at[pl.ds(2 + jax.lax.rem(i, 2), 1)],
                        vsem).wait()
                return 0

            jax.lax.fori_loop(0, n_leaf + 1, body, 0)

    def wave_cond(carry):
        return carry[0] > 0

    def wave_body_wide(carry):
        """8-wide wave: pop up to 8 super-nodes; each carries its 8
        children's bounds inline (nb = (48,W) cbounds, nm = (8,W) child
        ids) — no candidate indirection, ~4-7x fewer visits than the
        binary tree for the same chunk leaves.

        NOTE (r04): deferred-drain wave pipelining (previous wave's leaf
        drain overlapping this wave's verdict DMA on a second semaphore)
        was implemented and measured NEUTRAL on every load (primary
        +0.7%, bounce -1.2%, shadow -0.9% — BENCHMARKS.md r04): the
        verdict round trip is NOT a meaningful stall. Removed; git
        history has the implementation."""
        sp, n_visited, n_leaves = carry
        sp0 = sp
        popped = jnp.minimum(sp0, wwave)

        def pop_body(i, _):
            idx = jnp.maximum(sp0 - 1 - i, 0)
            cand[i] = jnp.where(i < popped, stack[idx], -1)
            return 0

        jax.lax.fori_loop(0, popped, pop_body, 0)
        sp = sp0 - popped

        # ---- vector phase: 8 child boxes per popped node ---------------
        # margin-only: unlike the binary path, the wide push below never
        # orders children by entry distance (fixed reverse-j order), so
        # computing/flushing entry minima here was pure waste (~1/3 of the
        # per-test vector ops) — removing it is bit-identical.
        def cand_body8(i, acc8):
            node = cand[jnp.minimum(i, wwave - 1)]
            valid = node >= 0
            nodec = jnp.maximum(node, 0)
            for j in range(8):
                base = 6 * j
                rowm = slab_margin_rows(
                    nb[base + 0, nodec], nb[base + 1, nodec],
                    nb[base + 2, nodec], nb[base + 3, nodec],
                    nb[base + 4, nodec], nb[base + 5, nodec])
                k = 8 * i + j
                rowm = jnp.where(valid, rowm, -1.0)
                acc8 = jnp.where(lane_iota == k, rowm, acc8)
            return acc8

        acc8 = jax.lax.fori_loop(
            0, popped, cand_body8,
            jnp.full(tmax.shape, -1.0, jnp.float32))
        margins = jnp.max(acc8, axis=0, keepdims=True)
        verdict_vmem[0:1, :] = margins
        dma = pltpu.make_async_copy(verdict_vmem.at[pl.ds(0, 1)],
                                    verdict_smem.at[pl.ds(0, 1)],
                                    wsem)
        dma.start()
        dma.wait()

        # ---- scalar phase: push internal survivors, queue leaf chunks --
        def push_body(p, carry):
            sp, both, nl = carry
            i = popped - 1 - p
            node = cand[jnp.clip(i, 0, wwave - 1)]
            nodec = jnp.maximum(node, 0)
            n_desc = jnp.int32(0)
            for j in range(7, -1, -1):
                k = 8 * i + j
                child = nm[j, nodec]
                hit = verdict_smem[
                    0, jnp.clip(k, 0, LANES - 1)] >= 0.0
                ok = (node >= 0) & hit
                stack[jnp.minimum(sp, STACK_DEPTH - 1)] = child
                sp = sp + jnp.where(ok & (child >= 0), 1, 0)
                n_desc = n_desc + jnp.where(ok & (child != -1), 1, 0)
                # compacted leaf queue: unconditional write, counter
                # advances only on real leaves (drain reads [0, nl))
                leafq[jnp.minimum(nl, LEAF_QUEUE - 1)] = -child - 2
                nl = nl + jnp.where(ok & (child <= -2), 1, 0)
            # traversal coherence (reference bothChildrenVisited %): nodes
            # where more than one child survived the packet's slab union
            both = both + jnp.where(n_desc >= 2, 1, 0)
            return sp, both, nl

        sp, n_both, n_leaf = jax.lax.fori_loop(
            0, popped, push_body, (sp, jnp.int32(0), jnp.int32(0)))
        counters[2] = counters[2] + n_both

        # ---- leaf phase -------------------------------------------------
        if "leaf" not in _DEBUG_SKIP:
            drain_leaves(n_leaf)
            n_leaves = n_leaves + n_leaf
        return sp, n_visited + popped, n_leaves

    def wave_body(carry):
        sp, n_visited, n_leaves = carry
        # Branchless wave processing: every scalar `lax.cond` in these loops
        # was a measured ~us-scale pipeline stall; fixed slots + arithmetic
        # selects + unconditional stack writes avoid all of them.

        # ---- scalar phase 1: pop up to WAVE nodes into fixed slots -----
        sp0 = sp
        popped = jnp.minimum(sp0, WAVE)

        def pop_body(i, nl):
            idx = jnp.maximum(sp0 - 1 - i, 0)
            node = stack[idx]
            valid = i < popped
            is_leaf = nm[1, node] == 1
            meta = nm[0, node]
            # leaves -> compacted queue; internals -> fixed candidate pair
            leafq[jnp.minimum(nl, LEAF_QUEUE - 1)] = meta
            nl = nl + jnp.where(valid & is_leaf, 1, 0)
            internal_ok = valid & jnp.logical_not(is_leaf)
            cand[2 * i] = jnp.where(internal_ok, node + 1, -1)
            cand[2 * i + 1] = jnp.where(internal_ok, meta, -1)
            return nl

        # Dynamic trip counts: a wave early in the descent has only a few
        # live nodes; fixed-size loops made every wave pay the full
        # 64-candidate cost (the measured ramp bottleneck).
        n_leaf = jax.lax.fori_loop(0, popped, pop_body, jnp.int32(0))
        sp = sp0 - popped
        n_cand = 2 * popped

        # ---- vector phase: batched AABB verdicts + entry distances ------
        # 4 candidates per iteration: the cand->bounds scalar load chains of
        # the 4 are independent, so they pipeline instead of serializing
        # (dependent SMEM loads measured ~0.3-1us each).
        def cand_body4(g, acc):
            margins, entries = acc
            for j in range(4):
                k = 4 * g + j
                in_range = k < n_cand
                c = jnp.where(in_range,
                              cand[jnp.minimum(k, MAX_CAND - 1)], -1)
                cc = jnp.maximum(c, 0)
                margin, entry = slab_test(nb[0, cc], nb[1, cc], nb[2, cc],
                                          nb[3, cc], nb[4, cc], nb[5, cc])
                margin = jnp.where(c >= 0, margin, -1.0)
                margins = jnp.where(lane_iota == k, margin, margins)
                entries = jnp.where(lane_iota == k, entry, entries)
            return margins, entries

        margins, entries = jax.lax.fori_loop(
            0, (n_cand + 3) // 4, cand_body4,
            (jnp.full((1, LANES), -1.0, jnp.float32),
             jnp.full((1, LANES), 3.0e38, jnp.float32)))
        verdict_vmem[0:1, :] = margins
        verdict_vmem[1:2, :] = entries
        flush_verdicts()

        # ---- scalar phase 2: push survivors, near child last (popped
        # first). Writes are unconditional; sp advances iff hit — entries
        # past sp are dead so stale writes are harmless. ------------------
        def push_body(p, carry):
            sp, both = carry
            pair = popped - 1 - p
            k0 = 2 * pair
            k1 = k0 + 1
            swap = verdict_smem[1, k1] < verdict_smem[1, k0]
            far = jnp.where(swap, cand[k0], cand[k1])
            near = jnp.where(swap, cand[k1], cand[k0])
            far_ok = jnp.where(swap, verdict_smem[0, k0],
                               verdict_smem[0, k1]) >= 0.0
            near_ok = jnp.where(swap, verdict_smem[0, k1],
                                verdict_smem[0, k0]) >= 0.0
            far_ok = far_ok & (far >= 0)
            near_ok = near_ok & (near >= 0)
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = far
            sp = sp + jnp.where(far_ok, 1, 0)
            stack[jnp.minimum(sp, STACK_DEPTH - 1)] = near
            sp = sp + jnp.where(near_ok, 1, 0)
            # reference bothChildrenVisited % (MetalRenderer.mm:1168-1347)
            both = both + jnp.where(far_ok & near_ok, 1, 0)
            return sp, both

        sp, n_both = jax.lax.fori_loop(0, popped, push_body,
                                       (sp, jnp.int32(0)))
        counters[2] = counters[2] + n_both

        # ---- leaf phase ------------------------------------------------
        if "leaf" not in _DEBUG_SKIP:
            drain_leaves(n_leaf)
            n_leaves = n_leaves + n_leaf
        return sp, n_visited + popped, n_leaves

    counters[0] = 0   # node visits
    counters[1] = 0   # leaf chunks tested
    counters[2] = 0   # nodes with >=2 surviving children (coherence)
    counters[3] = 0   # leaf prim slots MT-tested

    body_fn = wave_body_wide if wide else wave_body

    def run_pass(window):
        wt_ref[:] = window
        stack[0] = 0
        _, n_v, n_l = jax.lax.while_loop(
            wave_cond, body_fn, (jnp.int32(1), jnp.int32(0), jnp.int32(0)))
        counters[0] = counters[0] + n_v
        counters[1] = counters[1] + n_l

    if n_passes == 8:
        # One traversal pass per direction octant present in the packet.
        # Each ray belongs to exactly one pass; pass-absent lanes carry a
        # zero window so they never enter a slab union or commit a hit.
        for k in range(8):
            @pl.when(presence_smem[k] == 1)
            def _():
                mask = alive & (octant == k)
                run_pass(jnp.where(mask, bt_ref[:], 0.0))
                bt_ref[:] = jnp.where(mask, wt_ref[:], bt_ref[:])
    else:
        run_pass(bt_ref[:])
        bt_ref[:] = wt_ref[:]

    out_t[sl] = bt_ref[:]
    out_tri[sl] = btri_ref[:].astype(jnp.int32)
    out_u[sl] = bu_ref[:]
    out_v[sl] = bv_ref[:]
    # per-packet traversal counters in the u/v outputs' padding-free lanes
    # would corrupt results; emit via a dedicated stats output instead
    stats_iota = jax.lax.broadcasted_iota(jnp.int32, tmax.shape, 1)
    stats = jnp.where(stats_iota == 0,
                      counters[0].astype(jnp.float32), 0.0)
    stats = jnp.where(stats_iota == 1,
                      counters[1].astype(jnp.float32), stats)
    stats = jnp.where(stats_iota == 2,
                      counters[2].astype(jnp.float32), stats)
    stats = jnp.where(stats_iota == 3,
                      counters[3].astype(jnp.float32), stats)
    out_stats[sl] = stats


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_chunks", "t_min",
                                             "any_hit", "n_passes", "wide",
                                             "debug", "group", "wwave",
                                             "interpret"))
def _call(rays7, excl2, node_bounds, node_meta, chunk_tris,
          n_nodes, n_chunks, t_min, any_hit=False, n_passes=1, wide=False,
          debug="", group=1, wwave=8, interpret=False):
    assert t_min >= 0.0, "packet_trace requires t_min >= 0"
    rows = rays7[0].shape[0]
    grid = rows // (group * SUBLANES)
    # index maps receive (grid_idx, *scalar_prefetch_refs)
    ray_spec = pl.BlockSpec((group * SUBLANES, LANES),
                            lambda i, nb, nm: (i, 0),
                            memory_space=pltpu.VMEM)
    # Node arrays ride as scalar-prefetch: uploaded to SMEM ONCE per kernel
    # launch. As plain SMEM inputs they were re-copied on EVERY grid step —
    # a measured ~100us fixed cost per packet on larger trees.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[ray_spec] * 8 + [
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[ray_spec] * 5,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),      # traversal stack
            pltpu.SMEM((MAX_CAND,), jnp.int32),         # candidate children
            pltpu.SMEM((LEAF_QUEUE,), jnp.int32),       # leaf chunk queue
            pltpu.SMEM((4, LANES), jnp.float32),        # verdicts: rows 0-1
            # wave (margin, entry); rows 2-3 leaf-drain banks
            pltpu.SMEM((3, PLANES, CHUNK), jnp.float32),  # chunk tris (3 buf)
            pltpu.SemaphoreType.DMA((3,)),               # chunk DMA (3 buf)
            pltpu.SemaphoreType.DMA,                     # leaf verdict DMA
            pltpu.SemaphoreType.DMA,                     # wave verdict DMA
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # best t
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # best tri (as f32)
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # best u
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # best v
            pltpu.VMEM((2, LANES), jnp.float32),         # verdict vectors (margin, entry)
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # pass window (wt)
            pltpu.SMEM((8,), jnp.int32),                 # octant presence
            pltpu.SMEM((4,), jnp.int32),                 # stats counters
        ],
    )
    # Grid steps (packets) are independent: PARALLEL semantics lets
    # Mosaic overlap the per-step block copies with compute instead of
    # serializing them (the measured ~65us/step stub floor).
    compiler_params = None
    if os.environ.get("MPT_PARSEM", "1") == "1":
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        functools.partial(_kernel, n_nodes, t_min, any_hit, n_passes, wide,
                          debug, group, wwave),
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
    )(node_bounds, node_meta, *rays7, excl2, chunk_tris)


def packet_trace(origin, direction, t_min, t_max, bvh: PacketBvh,
                 exclude_prim=None, any_hit: bool = False):
    """Nearest triangle hit for a flat wavefront.

    Returns (t, tri_index (-1 miss), u, v) each (N,). With any_hit=True the
    returned tri index is *a* hit (not the nearest) and t is meaningless —
    shadow-ray semantics with in-kernel early union collapse.

    Packet coherence comes from upstream order: the renderer's 8x128
    pixel tiles for primaries, and the survivor compaction's
    octant+Morton reorder for bounce wavefronts (ops/pallas/shade.py).
    """
    n = origin.shape[0]

    # Packet-level dead compaction (default ON): permute whole 1024-ray
    # packets so entirely-dead packets cluster at the tail, where the
    # kernel's tmax=0 early-exit makes them ~free. Unlike the lane-level
    # modes below, the permutation is 2048 ROW gathers of 4 KB blocks
    # (DMA-shaped, ~0.1 ms for all 11 arrays) — the lane-gather cost that
    # sank MPT_RAY_SORT does not apply. Measured: trace scales 24 -> 13.9/
    # 7.5/4.7 ms at 50/25/10% alive when dead lanes cluster, vs NO scaling
    # scattered (r03 compaction probe). Bit-identical: per-ray results are
    # order-independent.
    if os.environ.get("MPT_PACKET_COMPACT", "1") == "1" \
            and n >= 4 * BLOCK and jnp.ndim(t_max) > 0:
        t_max_full = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32), (n,))
        n_pk = (n + BLOCK - 1) // BLOCK
        padded_n = n_pk * BLOCK

        def pk(v, fill=0.0):
            if v.shape[0] != padded_n:
                v = jnp.pad(v, (0, padded_n - v.shape[0]),
                            constant_values=fill)
            return v.reshape(n_pk, BLOCK)

        pk_dead = jnp.all(pk(t_max_full) <= t_min, axis=1)
        perm = jnp.argsort(pk_dead, stable=True)
        inv = jnp.argsort(perm)

        def take(v, fill=0.0):
            return pk(v, fill)[perm].reshape(-1)

        o_p = jnp.stack([take(origin[:, i]) for i in range(3)], -1)
        d_p = jnp.stack([take(direction[:, i], 1.0) for i in range(3)], -1)
        ex_p = None if exclude_prim is None else take(
            exclude_prim.astype(jnp.float32), -1.0).astype(jnp.int32)
        t, tri, u, v = packet_trace_unsorted(
            o_p, d_p, t_min, take(t_max_full), bvh,
            exclude_prim=ex_p, any_hit=any_hit)

        def untake(v):
            return v.reshape(n_pk, BLOCK)[inv].reshape(-1)[:n]

        return untake(t), untake(tri), untake(u), untake(v)

    # Lane-granular XLA-side ray sorting (full octant+Morton re-key,
    # tile-local octant grouping, alive-first partition) was measured a
    # LOSS on every load and removed (r02/r03 MPT_RAY_SORT entries in
    # BENCHMARKS.md; the gather cost at wavefront scale exceeds any
    # packing gain). The survivor-compaction reorder in the frame loop
    # (ops/pallas/shade.py octmorton key) provides the winning, DMA-shaped
    # version of the same idea.
    return packet_trace_unsorted(origin, direction, t_min, t_max, bvh,
                                 exclude_prim=exclude_prim, any_hit=any_hit)


def packet_trace_unsorted(origin, direction, t_min, t_max, bvh: PacketBvh,
                          exclude_prim=None, any_hit: bool = False,
                          return_stats: bool = False):
    n = origin.shape[0]
    # packets per grid step (fixed per-step overhead measured ~115us;
    # grouping amortizes it ~`group`x for cheap/dead packets)
    group = int(os.environ.get("MPT_GROUP", "1"))
    rows = ((n + group * BLOCK - 1) // (group * BLOCK)) * group * SUBLANES
    padded = rows * LANES

    def pad(v, fill=0.0):
        return jnp.pad(v, (0, padded - n),
                       constant_values=fill).reshape(rows, LANES)

    rays7 = tuple(pad(origin[:, i]) for i in range(3)) + \
        tuple(pad(direction[:, i], fill=1.0) for i in range(3)) + \
        (pad(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))),)
    if exclude_prim is None:
        excl = jnp.full((n,), -1.0, jnp.float32)
    else:
        excl = exclude_prim.astype(jnp.float32)
    excl2 = pad(excl, fill=-1.0)

    # Octant-masked passes: measured on-chip (tools/abbench.py): random-
    # soup loads +30% with the wide tree, but REAL bounce wavefronts
    # (tile-local origins) ran 1.7x FASTER without the 8-pass overhead —
    # so passes are opt-in (MPT_OCTANT_PASSES=1), not the default.
    n_passes = 8 if os.environ.get("MPT_OCTANT_PASSES", "0") == "1" else 1
    wide = (os.environ.get("MPT_WIDE", "1") == "1"
            and bvh.wnode_child is not None and bvh.n_wnodes > 0)
    debug = os.environ.get("MPT_TRAVERSE_DEBUG", "")
    # 8 children per wide node; >16 waves could queue more than LEAF_QUEUE
    # chunks and the clamp at the leafq write would silently drop hits.
    # wwave default 16 (r04 A/B: primary 37.3 vs 34.5 Mrays/s, bounce
    # neutral, hits bit-identical — one verdict DMA covers 2x the supers)
    wwave = min(max(int(os.environ.get("MPT_WWAVE", "16")), 1),
                LEAF_QUEUE // 8)
    # NOTE: six in-kernel modes were implemented, measured negative on
    # hardware, and removed (see BENCHMARKS.md "measured negatives" and
    # git history): bit-packed verdict reductions (MPT_BITVERDICT),
    # all-occluded shadow early exit (MPT_SHADOW_EXIT), precomputed-madd
    # slab form (MPT_MADDSLAB), XLA-side lane ray sorting (MPT_RAY_SORT),
    # near-first push order (MPT_NEARFIRST, r04: primary +4.9% but
    # bounce -5.0% and bounces dominate), and the per-row leaf drain
    # (MPT_ROWDRAIN, r04: 2.7x slower — group gating already harvests
    # the demand sparsity). r05 adds: MXU verdict-offload mask matmuls
    # (MPT_MXUVERDICT, commit c2e605c: bit-identical but primary -7.8% /
    # bounce -10.1% / shadow -8.8% — f32 matmul issue cost exceeds the
    # 7-step lane reduces) and octant passes on sun-coherent shadow
    # wavefronts (shadow -44%: packets are already ~octant-pure, the
    # 8-pass root re-descents are pure overhead).
    interpret = os.environ.get("MPT_TRACE_INTERPRET", "0") == "1"
    if wide:
        t, tri, u, v, stats = _call(rays7, excl2, bvh.wnode_cbounds,
                                    bvh.wnode_child, bvh.chunk_tris,
                                    bvh.n_wnodes, bvh.n_chunks,
                                    float(t_min), any_hit, n_passes, True,
                                    debug, group, wwave, interpret)
    else:
        t, tri, u, v, stats = _call(rays7, excl2, bvh.node_bounds,
                                    bvh.node_meta, bvh.chunk_tris,
                                    bvh.n_nodes, bvh.n_chunks,
                                    float(t_min), any_hit, n_passes,
                                    debug=debug, group=group, wwave=wwave,
                                    interpret=interpret)
    flat = lambda x: x.reshape(-1)[:n]
    if return_stats:
        # per-packet counters (reference PathtraceStats nodesVisited /
        # leafPrimTests analogues, MetalRenderer.mm:1168-1347): stats rows
        # repeat the packet's scalars across sublanes; take row 0 per packet
        per_packet = stats[0::SUBLANES]
        totals = {
            "nodes_visited": jnp.sum(per_packet[:, 0]),
            "leaf_chunks_tested": jnp.sum(per_packet[:, 1]),
            "both_children_visited": jnp.sum(per_packet[:, 2]),
            "leaf_prim_tests": jnp.sum(per_packet[:, 3]),
            "packets": jnp.float32(per_packet.shape[0]),
        }
        if any_hit:
            # shadow-ray early-exit % (reference PerformanceStats): a lane
            # whose window collapsed found occlusion before draining
            totals["shadow_occluded_lanes"] = jnp.sum(
                (tri.reshape(-1)[:n] >= 0).astype(jnp.float32))
        return flat(t), flat(tri), flat(u), flat(v), totals
    return flat(t), flat(tri), flat(u), flat(v)

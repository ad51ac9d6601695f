"""Packet-BVH: the TPU-native acceleration structure layout.

The reference traverses a per-thread stack over a binary BVH
(reference: pathtrace.metal:1733-2384). On TPU, per-lane stacks and
per-lane node gathers are hostile to the VPU; instead rays are traced in
*packets* (one 1024-ray block per grid step) that share a scalar traversal
stack (ops/pallas/traverse.py):

- the full binary SAH tree over triangle *chunks* lives in SMEM (scalar
  reads, zero DMA on the traversal path),
- each leaf references a 256-slot aligned chunk of triangles stored as
  dense planes in HBM, DMA'd to SMEM and tested against the whole packet
  with full-width VPU ops (no gathers anywhere).

Built on top of the binary SAH builder (scene/meshbuild.py / native C++).
"""

from __future__ import annotations

from typing import Any

import numpy as np
from flax import struct

from metal_pathtracer_tpu.scene import meshbuild

import os

CHUNK = 256          # triangle slots per leaf chunk (DMA granularity)
# Sub-AABB groups per chunk (in-chunk packet culling). 32 won when MT
# tests dominated (round 2); the swapped runtime + divergent bench scene
# moved the cost to the group slab tests themselves, so the sweet spot is
# load-dependent — env-tunable for A/B (layout + kernel read it together;
# a PacketBvh must be built with the same value the kernel traces with).
SUBCHUNKS = int(os.environ.get("MPT_SUBCHUNKS", "32"))
# SMEM node cap. The traversal kernel's node arrays ride as scalar
# prefetch into SMEM: binary tree 32 B/node + 8-wide collapsed tree
# ~224 B/wnode (~N/5 wnodes) — ~76 B/node total. tools/smemcap.py
# measured the real v5e ceiling (2026-08-20): 15,199 nodes / 4,076
# wnodes (est 944KB) compiles and runs; 15,655 / 4,281 (est 988KB)
# fails to compile. 15,300 keeps margin below the measured boundary
# and un-degrades the 1.32M-tri bench mesh (15,065 nodes at leaf 256,
# which the old 15,000 budget silently re-split at leaf 512).
# MPT_NODE_BUDGET overrides.
NODE_BUDGET = int(os.environ.get("MPT_NODE_BUDGET", "15300"))
PLANES = 16          # v0(3) e1(3) e2(3) + subAABBs(row 9) + tri-id(10) + valid(11)

Array = Any


@struct.dataclass
class PacketBvh:
    node_bounds: Array   # (6, N) f32 — minx,miny,minz,maxx,maxy,maxz
    node_meta: Array     # (2, N) i32 — [right_child | chunk_id], is_leaf
    chunk_tris: Array    # (n_chunks, PLANES, CHUNK) f32 — see _pack_chunks
    chunk_aabb: Array = None  # (n_chunks, 6) f32 — leaf chunk AABBs (culltrace)
    # 8-wide collapsed tree (the wave-phase scalar cost scales with node
    # VISITS; 8-wide cuts visits ~4-7x for the same chunk leaves):
    wnode_child: Array = None   # (8, W) i32 — >=0 super; -1 empty; <=-2 chunk(-c-2)
    wnode_cbounds: Array = None  # (48, W) f32 — 6 bounds per child slot
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_chunks: int = struct.field(pytree_node=False, default=0)
    n_wnodes: int = struct.field(pytree_node=False, default=0)


def build_packet_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     chunk: int = CHUNK) -> PacketBvh:
    """Binary SAH tree with <=chunk-triangle leaves, leaves packed into
    aligned dense chunks."""
    import jax.numpy as jnp

    n = v0.shape[0]
    max_leaf = chunk  # fill the 256-slot chunks (leaves land in (128, 256];
    # half-sized leaves measured ~35% slot fill — most MT work was padding)
    nodes = _build_nodes(v0, v1, v2, max_leaf)
    while len(nodes["prim_offset"]) > NODE_BUDGET:
        # Node-budget fallback: bigger SAH leaves shrink the *internal* tree;
        # oversized leaves are then re-split into multiple full 256-slot
        # chunks below (the kernel's CHUNK DMA/tile shape is fixed — growing
        # the chunk would mismatch tri_buf and the sub-chunk group size).
        # Coarser leaves cost real traversal throughput, so degrading is
        # LOUD (VERDICT r04 weak #6): warn by default, raise under
        # MPT_NODE_BUDGET_STRICT=1. Raise MPT_NODE_BUDGET if the chip's
        # SMEM allows (tools/smemcap.py measures it).
        msg = (f"packet BVH needs {len(nodes['prim_offset'])} nodes at "
               f"leaf {max_leaf} (> NODE_BUDGET={NODE_BUDGET}); doubling "
               f"leaf size to {max_leaf * 2} — traversal will degrade. "
               f"Measure the SMEM ceiling (tools/smemcap.py) and raise "
               f"MPT_NODE_BUDGET, or shrink the scene.")
        if os.environ.get("MPT_NODE_BUDGET_STRICT", "0") == "1":
            raise ValueError(msg)
        import warnings
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        max_leaf *= 2
        nodes = _build_nodes(v0, v1, v2, max_leaf)
        if max_leaf > 64 * chunk:
            break
    if max_leaf > chunk:
        nodes = _split_oversized_leaves(nodes, v0, v1, v2, chunk)
        if len(nodes["prim_offset"]) > 4 * NODE_BUDGET:
            raise ValueError(
                f"scene needs {len(nodes['prim_offset'])} BVH nodes "
                f"(> {4 * NODE_BUDGET}); the SMEM-resident tree caps out "
                f"around {4 * NODE_BUDGET // 2 * chunk} triangles")

    n_nodes = len(nodes["prim_offset"])
    prim_count = nodes["prim_count"]
    prim_offset = nodes["prim_offset"]
    exit_index = nodes["exit_index"]
    prim_indices = nodes["prim_indices"]

    is_leaf = prim_count > 0
    # children from the DFS + exit-link layout: left = i+1,
    # right = exit(left) (meshbuild._flatten_with_exit_links invariant)
    right_child = np.zeros(n_nodes, np.int32)
    internal = np.nonzero(~is_leaf)[0]
    right_child[internal] = exit_index[internal + 1]

    # pack leaves into aligned chunks
    leaf_ids = np.nonzero(is_leaf)[0]
    n_chunks = len(leaf_ids)
    chunk_tris = np.zeros((n_chunks, PLANES, chunk), np.float32)
    chunk_of_leaf = np.zeros(n_nodes, np.int32)
    for ci, leaf in enumerate(leaf_ids):
        off = prim_offset[leaf]
        cnt = prim_count[leaf]
        ids = prim_indices[off:off + cnt]
        # Morton-order slots within the chunk: sub-chunk AABBs gate runs of
        # consecutive slots, so spatially sorted slots give tight sub-boxes
        # (the builder's partition order leaves them loose).
        cent = (v0[ids] + v1[ids] + v2[ids]) / 3.0
        span = np.maximum(cent.max(0) - cent.min(0), 1e-12)
        q = np.clip(((cent - cent.min(0)) / span * 1023.0), 0, 1023
                    ).astype(np.uint64)
        key = _morton3(q[:, 0]) | (_morton3(q[:, 1]) << 1) \
            | (_morton3(q[:, 2]) << 2)
        ids = ids[np.argsort(key, kind="stable")]
        tv0 = v0[ids]
        e1 = v1[ids] - tv0
        e2 = v2[ids] - tv0
        chunk_tris[ci, 0:3, :cnt] = tv0.T
        chunk_tris[ci, 3:6, :cnt] = e1.T
        chunk_tris[ci, 6:9, :cnt] = e2.T
        chunk_tris[ci, 10, :cnt] = ids.astype(np.float32)
        chunk_tris[ci, 11, :cnt] = 1.0
        chunk_of_leaf[leaf] = ci
        # Sub-chunk AABBs for in-chunk packet culling: row 9 lanes
        # [k*6, k*6+6) = (minx,miny,minz,maxx,maxy,maxz) of slot group k,
        # lane 48+k = group-valid flag. The flag, not an "inverted box",
        # gates empty groups: the slab test's per-axis min/max re-sorts the
        # interval, so an inverted box PASSES for every ray — empty groups
        # were silently MT-tested (measured 7.2/8 groups passing at 35%
        # chunk fill: ~61% of all triangle tests were empty slots).
        group = chunk // SUBCHUNKS
        tv1 = v1[ids]
        tv2 = v2[ids]
        for k in range(SUBCHUNKS):
            lo = k * group
            hi = min(lo + group, cnt)
            if lo >= cnt:
                chunk_tris[ci, 9, k * 6:k * 6 + 6] = 0.0
                continue
            pts = np.concatenate([tv0[lo:hi], tv1[lo:hi], tv2[lo:hi]], 0)
            chunk_tris[ci, 9, k * 6:k * 6 + 3] = pts.min(0)
            chunk_tris[ci, 9, k * 6 + 3:k * 6 + 6] = pts.max(0)
            chunk_tris[ci, 9, 6 * SUBCHUNKS + k] = 1.0

    meta = np.zeros((2, n_nodes), np.int32)
    meta[0] = np.where(is_leaf, chunk_of_leaf, right_child)
    meta[1] = is_leaf.astype(np.int32)

    wchild, wcbounds = _collapse_wide(
        nodes["bounds_min"], nodes["bounds_max"], is_leaf, right_child,
        chunk_of_leaf)

    bounds = np.stack([
        nodes["bounds_min"][:, 0], nodes["bounds_min"][:, 1],
        nodes["bounds_min"][:, 2],
        nodes["bounds_max"][:, 0], nodes["bounds_max"][:, 1],
        nodes["bounds_max"][:, 2]], 0).astype(np.float32)

    # chunk AABBs = the leaf nodes' bounds, ordered by chunk id (culltrace's
    # XLA-side conservative cull uses these)
    chunk_aabb = np.concatenate(
        [nodes["bounds_min"][leaf_ids], nodes["bounds_max"][leaf_ids]],
        1).astype(np.float32)

    return PacketBvh(
        node_bounds=jnp.asarray(bounds),
        node_meta=jnp.asarray(meta),
        chunk_tris=jnp.asarray(chunk_tris),
        chunk_aabb=jnp.asarray(chunk_aabb),
        wnode_child=jnp.asarray(wchild),
        wnode_cbounds=jnp.asarray(wcbounds),
        n_nodes=int(n_nodes),
        n_chunks=int(n_chunks),
        n_wnodes=int(wchild.shape[1]),
    )


def _split_oversized_leaves(nodes, v0, v1, v2, chunk):
    """Re-flatten the tree with every leaf holding <= chunk triangles.

    Oversized SAH leaves (from the node-budget fallback) become balanced
    binary subtrees over Morton-sorted runs of <= chunk prims — each run
    lands ~100% full in its 256-slot chunk, and stays spatially coherent
    for the sub-chunk AABB gates. Preserves the DFS left=i+1 / exit-link
    layout the rest of build_packet_bvh assumes.
    """
    bmin, bmax = nodes["bounds_min"], nodes["bounds_max"]
    p_off, p_cnt = nodes["prim_offset"], nodes["prim_count"]
    exit_idx, prims = nodes["exit_index"], nodes["prim_indices"]

    out = {k: [] for k in ("bounds_min", "bounds_max", "prim_count")}
    out_prims = []

    def emit(bmn, bmx, cnt):
        out["bounds_min"].append(bmn)
        out["bounds_max"].append(bmx)
        out["prim_count"].append(cnt)
        return len(out["prim_count"]) - 1

    def emit_groups(ids):
        """Balanced subtree over sequential <=chunk runs of ids (Morton
        order). Returns this subtree's root index."""
        m = (len(ids) + chunk - 1) // chunk
        if m == 1:
            pts = np.concatenate([v0[ids], v1[ids], v2[ids]], 0)
            me = emit(pts.min(0), pts.max(0), len(ids))
            out_prims.append(ids)
            return me
        pts = np.concatenate([v0[ids], v1[ids], v2[ids]], 0)
        me = emit(pts.min(0), pts.max(0), 0)
        cut = ((m + 1) // 2) * chunk
        emit_groups(ids[:cut])
        right_of[me] = emit_groups(ids[cut:])
        return me

    right_of = {}

    def walk(i):
        if p_cnt[i] > 0:
            ids = prims[p_off[i]:p_off[i] + p_cnt[i]]
            if len(ids) > chunk:
                cent = (v0[ids] + v1[ids] + v2[ids]) / 3.0
                span = np.maximum(cent.max(0) - cent.min(0), 1e-12)
                q = np.clip((cent - cent.min(0)) / span * 1023.0,
                            0, 1023).astype(np.uint64)
                key = (_morton3(q[:, 0]) | (_morton3(q[:, 1]) << 1)
                       | (_morton3(q[:, 2]) << 2))
                return emit_groups(ids[np.argsort(key, kind="stable")])
            me = emit(bmin[i], bmax[i], len(ids))
            out_prims.append(ids)
            return me
        me = emit(bmin[i], bmax[i], 0)
        walk(i + 1)
        right_of[me] = walk(exit_idx[i + 1])
        return me

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 200000))
    try:
        walk(0)
    finally:
        sys.setrecursionlimit(old_limit)

    n_new = len(out["prim_count"])
    prim_count = np.asarray(out["prim_count"], np.int32)
    prim_offset = np.zeros(n_new, np.int32)
    off = 0
    for leaf in np.nonzero(prim_count > 0)[0]:
        prim_offset[leaf] = off
        off += prim_count[leaf]
    prim_indices = (np.concatenate(out_prims).astype(np.int32)
                    if out_prims else np.zeros(0, np.int32))
    # rebuild exit links from right_of: exit(subtree of i) follows from
    # right siblings; build_packet_bvh only reads exit_index[i+1] for
    # internals, i.e. the right child of i — store exactly that contract.
    exit_index = np.zeros(n_new, np.int32)
    for parent, rc in right_of.items():
        exit_index[parent + 1] = rc
    return {
        "bounds_min": np.asarray(out["bounds_min"], np.float32),
        "bounds_max": np.asarray(out["bounds_max"], np.float32),
        "prim_offset": prim_offset,
        "prim_count": prim_count,
        "exit_index": exit_index,
        "prim_indices": prim_indices,
    }


def _morton3(x):
    """Spread 10-bit ints so bits land every 3rd position (uint64)."""
    x = x.astype(np.uint64)
    x = (x | (x << 16)) & np.uint64(0x30000FF)
    x = (x | (x << 8)) & np.uint64(0x300F00F)
    x = (x | (x << 4)) & np.uint64(0x30C30C3)
    x = (x | (x << 2)) & np.uint64(0x9249249)
    return x


def _collapse_wide(bmin, bmax, is_leaf, right_child, chunk_of_leaf,
                   width: int = 8):
    """Collapse the binary tree into an 8-wide tree over the same chunks.

    Each super-node absorbs binary descendants greedily (largest surface
    area split first) until it has <= 8 children; children are either other
    super-nodes (id >= 0) or leaf chunks (encoded -chunk-2; -1 = empty).
    Returns (wchild (8, W) i32, wcbounds (48, W) f32).
    """
    area = ((bmax - bmin).clip(0)[:, [0, 0, 1]]
            * (bmax - bmin).clip(0)[:, [1, 2, 2]]).sum(1)

    def children_of(n):
        return (n + 1, right_child[n])

    wchild_rows = []
    wbound_rows = []
    # queue of (binary node id); super id = position in wchild_rows
    if is_leaf[0]:
        # degenerate single-leaf tree: one super holding the one chunk
        row = np.full(width, -1, np.int64)
        row[0] = -int(chunk_of_leaf[0]) - 2
        bounds = np.zeros((width, 6), np.float32)
        bounds[:, 0:3] = 3.0e37
        bounds[:, 3:6] = -3.0e37
        bounds[0, 0:3] = bmin[0]
        bounds[0, 3:6] = bmax[0]
        return (row.reshape(width, 1).astype(np.int32),
                bounds.reshape(width * 6, 1).astype(np.float32))

    queue = [0]
    pending = {}  # binary node -> (super id, slot) to patch
    while queue:
        b = queue.pop()
        sid = len(wchild_rows)
        if b in pending:
            ps, slot = pending.pop(b)
            wchild_rows[ps][slot] = sid
        # expand b's subtree into <= width slots
        slots = list(children_of(b))
        while len(slots) < width:
            internals = [s for s in slots if not is_leaf[s]]
            if not internals:
                break
            pick = max(internals, key=lambda s: area[s])
            slots.remove(pick)
            slots.extend(children_of(pick))
        row = np.full(width, -1, np.int64)
        bounds = np.zeros((width, 6), np.float32)
        bounds[:, 0:3] = 3.0e37   # empty slots: inverted boxes
        bounds[:, 3:6] = -3.0e37
        for j, s in enumerate(slots):
            bounds[j, 0:3] = bmin[s]
            bounds[j, 3:6] = bmax[s]
            if is_leaf[s]:
                row[j] = -int(chunk_of_leaf[s]) - 2
            else:
                pending[s] = (sid, j)
                queue.append(s)
        wchild_rows.append(row)
        wbound_rows.append(bounds)

    wchild = np.stack(wchild_rows, 1).astype(np.int32)       # (8, W)
    wcbounds = np.stack(wbound_rows, 2).reshape(48, -1).astype(np.float32)
    return wchild, wcbounds


def _build_nodes(v0, v1, v2, max_leaf):
    lib = meshbuild._native_lib()
    if lib is not None:
        if os.environ.get("MPT_SBVH", "1") == "1" \
                and hasattr(lib, "build_bvh_sbvh"):
            try:
                return _native_nodes_sbvh(lib, v0, v1, v2, max_leaf)
            except Exception:
                pass
        try:
            return _native_nodes(lib, v0, v1, v2, max_leaf)
        except Exception:
            pass
    old = meshbuild.MAX_LEAF
    try:
        meshbuild.MAX_LEAF = max_leaf
        return meshbuild._build_bvh_numpy(v0, v1, v2)
    finally:
        meshbuild.MAX_LEAF = old


def _native_nodes_sbvh(lib, v0, v1, v2, max_leaf):
    """SBVH spatial-split build (Stich et al. 2009; native builder).

    Triangles may be referenced by several leaves with clipped bounds —
    sibling overlap on displaced/long-triangle meshes drops, so packets
    visit fewer nodes and pass fewer chunk verdicts. Duplicates are
    transparent downstream: chunk slots carry original triangle ids, and a
    hit against any reference is the same (id, t). Reference budget 35%
    extra (SBVH paper's typical <30% at alpha=1e-5)."""
    import ctypes

    n = v0.shape[0]
    verts = np.ascontiguousarray(np.concatenate(
        [v0.astype(np.float32), v1.astype(np.float32), v2.astype(np.float32)],
        axis=1))
    max_refs = int(n * 1.35) + 64
    # worst case 2*refs-1 nodes (unbalanced singleton splits on tiny
    # meshes exceed 3n); the builder returns -3 if this is ever short
    max_nodes = 2 * max_refs
    bounds_min = np.zeros((max_nodes, 3), np.float32)
    bounds_max = np.zeros((max_nodes, 3), np.float32)
    prim_offset = np.zeros(max_nodes, np.int32)
    prim_count = np.zeros(max_nodes, np.int32)
    exit_index = np.zeros(max_nodes, np.int32)
    prim_indices = np.zeros(max_refs, np.int32)
    n_refs = np.zeros(1, np.int32)
    lib.build_bvh_sbvh.restype = ctypes.c_int
    # explicit argtypes: a bare c_float would be promoted to double under
    # the default (varargs-like) ctypes call and corrupt the ABI
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.build_bvh_sbvh.argtypes = [
        ctypes.c_int, fp, fp, fp, ip, ip, ip, ip,
        ctypes.c_int, ctypes.c_int, ip,
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    n_nodes = lib.build_bvh_sbvh(
        ctypes.c_int(n),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bounds_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bounds_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        prim_offset.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        prim_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        exit_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        prim_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(max_refs),
        ctypes.c_int(max_nodes),
        n_refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(max_leaf),
        ctypes.c_int(meshbuild.SAH_BINS),
        ctypes.c_float(1e-5),
    )
    if n_nodes <= 0:
        raise RuntimeError(f"native SBVH build failed ({n_nodes})")
    return {
        "bounds_min": bounds_min[:n_nodes],
        "bounds_max": bounds_max[:n_nodes],
        "prim_offset": prim_offset[:n_nodes],
        "prim_count": prim_count[:n_nodes],
        "exit_index": exit_index[:n_nodes],
        "prim_indices": prim_indices[:int(n_refs[0])],
    }


def _native_nodes(lib, v0, v1, v2, max_leaf):
    import ctypes

    n = v0.shape[0]
    verts = np.ascontiguousarray(np.concatenate(
        [v0.astype(np.float32), v1.astype(np.float32), v2.astype(np.float32)],
        axis=1))
    max_nodes = max(2 * n, 2)
    bounds_min = np.zeros((max_nodes, 3), np.float32)
    bounds_max = np.zeros((max_nodes, 3), np.float32)
    prim_offset = np.zeros(max_nodes, np.int32)
    prim_count = np.zeros(max_nodes, np.int32)
    exit_index = np.zeros(max_nodes, np.int32)
    prim_indices = np.zeros(n, np.int32)
    lib.build_bvh_sah.restype = ctypes.c_int
    n_nodes = lib.build_bvh_sah(
        ctypes.c_int(n),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bounds_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bounds_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        prim_offset.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        prim_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        exit_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        prim_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(max_leaf),
        ctypes.c_int(meshbuild.SAH_BINS),
    )
    if n_nodes <= 0:
        raise RuntimeError("native BVH build failed")
    return {
        "bounds_min": bounds_min[:n_nodes],
        "bounds_max": bounds_max[:n_nodes],
        "prim_offset": prim_offset[:n_nodes],
        "prim_count": prim_count[:n_nodes],
        "exit_index": exit_index[:n_nodes],
        "prim_indices": prim_indices,
    }

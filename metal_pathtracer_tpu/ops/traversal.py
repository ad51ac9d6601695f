"""Vectorized BVH traversal + Möller–Trumbore over the triangle soup.

The TPU re-design of the reference's stack-based software traversal
(reference: shaders/pathtrace.metal traverse_bvh_triangles:1852-1970,
trace_scene_tlas_triangles:2167-2384): instead of a per-thread 128-entry
stack, the BVH is flattened depth-first with **exit links**
(scene/meshbuild.py), so every lane runs the same loop

    node = hit(aabb) ? (leaf ? test prims, exit : node+1) : exit

with per-lane node pointers — a single `lax.while_loop` over masked lanes,
no stacks, no dynamic shapes. Leaf triangle tests are MAX_LEAF-wide masked
gathers. A Pallas kernel variant lives in ops/pallas/traverse.py.

Self-hit exclusion by (mesh, primitive) id matches
compute_exclusion_indices (reference: pathtrace.metal:258-269).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metal_pathtracer_tpu.constants import (
    INFINITY_T,
    PRIMITIVE_TRIANGLE,
)
from metal_pathtracer_tpu.ops.intersect import HitRecord
from metal_pathtracer_tpu.ops.vecmath import dot, safe_normalize, where3
from metal_pathtracer_tpu.scene.meshbuild import MAX_LEAF


def _intersect_tris(origin, direction, tri_ids, tris, t_min, t_max,
                    exclude_mesh, exclude_prim):
    """Möller–Trumbore for a (lanes, K) block of triangle candidates
    (reference: pathtrace.metal intersect_triangle_parametric:544-592).

    Returns (t, u, v, valid) each (lanes, K).
    """
    v0 = tris.v0[tri_ids]           # (N,K,3)
    v1 = tris.v1[tri_ids]
    v2 = tris.v2[tri_ids]
    edge1 = v1 - v0
    edge2 = v2 - v0
    d = direction[..., None, :]
    pvec = jnp.cross(d, edge2)
    det = jnp.sum(edge1 * pvec, -1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
    tvec = origin[..., None, :] - v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, edge1)
    v = jnp.sum(d * qvec, -1) * inv_det
    t = jnp.sum(edge2 * qvec, -1) * inv_det

    excl = jnp.logical_and(
        tris.mesh_index[tri_ids] == exclude_mesh[..., None],
        tri_ids == exclude_prim[..., None])
    valid = ((jnp.abs(det) >= 1e-8)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (t >= t_min[..., None]) & (t <= t_max[..., None])
             & jnp.logical_not(excl))
    return t, u, v, valid


def trace_triangles(origin, direction, scene, t_min, t_max,
                    exclude_mesh=None, exclude_prim=None,
                    max_steps: int = 0) -> HitRecord:
    """Nearest-hit trace of the wavefront against the triangle BVH.

    Dispatches to the Pallas packet-traversal kernel on TPU
    (ops/pallas/traverse.py); the stackless jnp loop below is the CPU /
    debug reference implementation.
    """
    from metal_pathtracer_tpu.ops.intersect import _use_pallas

    shape = origin.shape[:-1]
    if scene.tri_packet is not None and _use_pallas() and len(shape) == 1:
        from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace
        excl = exclude_prim if exclude_prim is not None else None
        best_t, best_tri, best_u, best_v = packet_trace(
            origin, direction, t_min, t_max, scene.tri_packet,
            exclude_prim=excl)
        return _hit_record_from_best(origin, direction, scene.triangles,
                                     best_t, best_tri, best_u, best_v)

    tris = scene.triangles
    bvh = scene.tri_bvh
    n_nodes = bvh.node_count

    if exclude_mesh is None:
        exclude_mesh = jnp.full(shape, -1, jnp.int32)
    if exclude_prim is None:
        exclude_prim = jnp.full(shape, -1, jnp.int32)

    t_min_arr = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                              jnp.where(direction >= 0, 1e-20, -1e-20),
                              direction)

    # Conservative bound: every node visited once.
    if max_steps <= 0:
        max_steps = n_nodes + 1

    def cond(state):
        node, *_ = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, best_t, best_tri, best_u, best_v = state
        nd = jnp.minimum(node, n_nodes - 1)
        bmin = bvh.bounds_min[nd]
        bmax = bvh.bounds_max[nd]
        t0 = (bmin - origin) * inv_dir
        t1 = (bmax - origin) * inv_dir
        tnear = jnp.max(jnp.maximum(jnp.minimum(t0, t1),
                                    t_min_arr[..., None]), -1)
        tfar = jnp.min(jnp.maximum(t0, t1), -1)
        tfar = jnp.minimum(tfar, best_t)
        box_hit = tfar >= tnear

        pcount = bvh.prim_count[nd]
        is_leaf = pcount > 0
        active = node < n_nodes

        # Leaf: test up to MAX_LEAF reordered primitive slots (masked)
        do_leaf = active & box_hit & is_leaf
        poff = bvh.prim_offset[nd]
        slot = poff[..., None] + jnp.arange(MAX_LEAF)
        slot_valid = (jnp.arange(MAX_LEAF) < pcount[..., None]) & do_leaf[..., None]
        slot = jnp.clip(slot, 0, bvh.prim_indices.shape[0] - 1)
        tri_ids = bvh.prim_indices[slot]
        t, u, v, valid = _intersect_tris(
            origin, direction, tri_ids, tris, t_min_arr, best_t,
            exclude_mesh, exclude_prim)
        valid = valid & slot_valid
        t_masked = jnp.where(valid, t, INFINITY_T)
        k = jnp.argmin(t_masked, -1)
        t_hit = jnp.take_along_axis(t_masked, k[..., None], -1)[..., 0]
        any_valid = jnp.any(valid, -1)
        improved = any_valid & (t_hit < best_t)
        best_t = jnp.where(improved, t_hit, best_t)
        best_tri = jnp.where(improved,
                             jnp.take_along_axis(tri_ids, k[..., None], -1)[..., 0],
                             best_tri)
        best_u = jnp.where(improved,
                           jnp.take_along_axis(u, k[..., None], -1)[..., 0], best_u)
        best_v = jnp.where(improved,
                           jnp.take_along_axis(v, k[..., None], -1)[..., 0], best_v)

        # Advance: internal hit -> next node (node+1); otherwise exit link.
        descend = active & box_hit & jnp.logical_not(is_leaf)
        next_node = jnp.where(descend, nd + 1, bvh.exit_index[nd])
        node = jnp.where(active, next_node, node)
        return node, best_t, best_tri, best_u, best_v

    node0 = jnp.zeros(shape, jnp.int32)
    best_t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    state = (node0, best_t0,
             jnp.full(shape, -1, jnp.int32),
             jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    node, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, state)
    return _hit_record_from_best(origin, direction, tris,
                                 best_t, best_tri, best_u, best_v)


def _hit_record_from_best(origin, direction, tris, best_t, best_tri,
                          best_u, best_v) -> HitRecord:
    """Reconstruct the full hit record from (t, tri, u, v) via gathers."""
    shape = origin.shape[:-1]
    hit = best_tri >= 0
    tri = jnp.maximum(best_tri, 0)
    point = origin + best_t[..., None] * direction

    if tris.shade_packed is not None:
        # one (T,24) row gather — 8 narrow per-attribute gathers measured
        # ~270x slower on TPU (see BENCHMARKS.md)
        row = tris.shade_packed[tri]
        v0, v1, v2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
        n0c, n1c, n2c = row[..., 9:12], row[..., 12:15], row[..., 15:18]
        material = row[..., 18].astype(jnp.int32)
        mesh_index = row[..., 19].astype(jnp.int32)
    else:
        v0 = tris.v0[tri]
        v1 = tris.v1[tri]
        v2 = tris.v2[tri]
        n0c, n1c, n2c = tris.n0[tri], tris.n1[tri], tris.n2[tri]
        material = tris.material[tri]
        mesh_index = tris.mesh_index[tri]
    geo_n = safe_normalize(jnp.cross(v1 - v0, v2 - v0))
    front = dot(direction, geo_n) < 0.0
    n_faced = where3(front, geo_n, -geo_n)

    # Interpolate shading normal from per-corner normals using saturated
    # barycentric weights; flip toward the geometric normal
    # (reference: pathtrace.metal interpolate_shading_normal:597-700,
    # barycentric_weights_saturated:584-592, integrator flip :5895-5906).
    w = jnp.stack([1.0 - best_u - best_v, best_u, best_v], -1)
    w = jnp.maximum(w, 0.0)
    w_sum = jnp.sum(w, -1, keepdims=True)
    w = jnp.where(w_sum > 1e-8, w / w_sum,
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    sn = (w[..., 0:1] * n0c + w[..., 1:2] * n1c + w[..., 2:3] * n2c)
    sn_ok = jnp.all(jnp.isfinite(sn), -1) & (dot(sn, sn) > 0.0)
    sn = jnp.where((dot(sn, n_faced) < 0.0)[..., None], -sn, sn)
    sn = safe_normalize(sn)
    shading_n = where3(sn_ok, sn, n_faced)

    return HitRecord(
        hit=hit,
        t=jnp.where(hit, best_t, INFINITY_T),
        point=point,
        normal=n_faced,
        shading_normal=shading_n,
        front_face=front,
        two_sided=jnp.zeros(shape, bool),
        material=material,
        prim_type=jnp.where(hit, PRIMITIVE_TRIANGLE, 0).astype(jnp.int32),
        prim_index=tri.astype(jnp.int32),
        mesh_index=mesh_index,
        barycentric=jnp.stack([best_u, best_v], -1),
    )

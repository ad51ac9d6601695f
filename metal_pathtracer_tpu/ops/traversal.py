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
        if excl is not None and getattr(scene, "instanced", ()) \
                and exclude_mesh is not None:
            # the packet kernel excludes by prim id only; an instanced
            # prev-hit's OBJECT tri id must not exclude a soup triangle
            soup_meshes = scene.instanced[0].base_id
            excl = jnp.where(exclude_mesh < soup_meshes, excl, -1)
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


def _transform_point(m34, p):
    """(N,3) point through a per-lane-constant (3,4) affine row matrix."""
    return (p @ m34[:, :3].T) + m34[:, 3]


def _transform_dir(m34, d):
    return d @ m34[:, :3].T


def trace_instanced(origin, direction, scene, t_min, t_max,
                    exclude_mesh=None, exclude_prim=None) -> HitRecord:
    """Nearest hit over the scene's instanced mesh groups.

    Each group is one shared OBJECT-space BLAS traced once per instance
    with the ray affinely mapped into object space. The direction is
    mapped by the linear part WITHOUT renormalizing, so the hit parameter
    t is identical in both spaces and directly comparable across
    instances and the world-space soup (reference:
    SceneAccel.mm:173-247 SoftwareInstanceInfo worldToLocal +
    pathtrace.metal trace_scene_tlas_triangles:2167-2384).

    rec.mesh_index is the GLOBAL instance id (group.base_id + i), which
    keeps (mesh, prim) self-hit exclusion exact across instances.
    """
    shape = origin.shape[:-1]
    best = HitRecord.miss(shape)
    best = best.replace(t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                           shape))
    if exclude_mesh is None:
        exclude_mesh = jnp.full(shape, -1, jnp.int32)
    if exclude_prim is None:
        exclude_prim = jnp.full(shape, -1, jnp.int32)

    for group in scene.instanced:
        for i in range(group.count):
            inst_id = group.base_id + i
            o_l = _transform_point(group.w2l[i], origin)
            d_l = _transform_dir(group.w2l[i], direction)
            # exclusion only applies when the previous hit was THIS
            # instance (object tri ids repeat across instances)
            ex_p = jnp.where(exclude_mesh == inst_id, exclude_prim, -1)
            rec = _trace_group(group, o_l, d_l, origin, direction,
                               t_min, best.t, ex_p, inst_id)
            best = _closer_rec(best, rec)
    # lanes that never hit keep the miss record
    return best.replace(t=jnp.where(best.hit, best.t, INFINITY_T))


def _closer_rec(a: HitRecord, b: HitRecord) -> HitRecord:
    from metal_pathtracer_tpu.ops.intersect import _closer
    return _closer(a, b)


def _trace_group(group, o_l, d_l, o_w, d_w, t_min, t_max, exclude_prim,
                 inst_id) -> HitRecord:
    from metal_pathtracer_tpu.ops.intersect import _use_pallas

    shape = o_l.shape[:-1]
    if group.tri_packet is not None and _use_pallas() and len(shape) == 1:
        from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace
        best_t, best_tri, bu, bv = packet_trace(
            o_l, d_l, t_min, t_max, group.tri_packet,
            exclude_prim=exclude_prim)
    else:
        scene_like = _GroupSceneView(group)
        rec0 = trace_triangles(o_l, d_l, scene_like, t_min, t_max,
                               exclude_mesh=jnp.zeros(shape, jnp.int32),
                               exclude_prim=exclude_prim)
        best_t = jnp.where(rec0.hit, rec0.t, INFINITY_T)
        best_tri = jnp.where(rec0.hit, rec0.prim_index, -1)
        bu = rec0.barycentric[..., 0]
        bv = rec0.barycentric[..., 1]

    # Reconstruct the record in WORLD space: attributes interpolate in
    # object space, normals map by the inverse-transpose linear part.
    tris = group.triangles
    hit = best_tri >= 0
    tri = jnp.maximum(best_tri, 0)
    row = tris.shade_packed[tri]
    v0, v1, v2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
    n0c, n1c, n2c = row[..., 9:12], row[..., 12:15], row[..., 15:18]

    nmat = group.nrm_mat[_static_index(inst_id, group)]
    geo_l = jnp.cross(v1 - v0, v2 - v0)
    geo_w = safe_normalize(geo_l @ nmat.T)
    front = dot(d_w, geo_w) < 0.0
    n_faced = where3(front, geo_w, -geo_w)

    w0 = jnp.maximum(1.0 - bu - bv, 0.0)
    w1 = jnp.maximum(bu, 0.0)
    w2 = jnp.maximum(bv, 0.0)
    w_sum = jnp.maximum(w0 + w1 + w2, 1e-8)
    sn_l = (w0[..., None] * n0c + w1[..., None] * n1c
            + w2[..., None] * n2c) / w_sum[..., None]
    sn_w = sn_l @ nmat.T
    sn_ok = jnp.all(jnp.isfinite(sn_w), -1) & (dot(sn_w, sn_w) > 0.0)
    sn_w = jnp.where((dot(sn_w, n_faced) < 0.0)[..., None], -sn_w, sn_w)
    sn_w = safe_normalize(sn_w)
    shading_n = where3(sn_ok, sn_w, n_faced)

    material = group.material[_static_index(inst_id, group)]
    point = o_w + best_t[..., None] * d_w
    shape = o_w.shape[:-1]
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, best_t, INFINITY_T),
        point=point,
        normal=n_faced,
        shading_normal=shading_n,
        front_face=front,
        two_sided=jnp.zeros(shape, bool),
        material=jnp.broadcast_to(material, shape).astype(jnp.int32),
        prim_type=jnp.where(hit, PRIMITIVE_TRIANGLE, 0).astype(jnp.int32),
        prim_index=tri.astype(jnp.int32),
        mesh_index=jnp.full(shape, inst_id, jnp.int32),
        barycentric=jnp.stack([bu, bv], -1),
    )


def _static_index(inst_id, group):
    return inst_id - group.base_id


class _GroupSceneView:
    """Duck-typed scene view so trace_triangles reads a group's arrays."""

    def __init__(self, group):
        self.triangles = group.triangles
        self.tri_bvh = group.tri_bvh
        self.tri_packet = None


def trace_instanced_occluded(origin, direction, scene, t_min, t_max):
    """Any-hit over the instanced groups (shadow rays)."""
    from metal_pathtracer_tpu.ops.intersect import _use_pallas

    shape = origin.shape[:-1]
    occluded = jnp.zeros(shape, bool)
    for group in scene.instanced:
        for i in range(group.count):
            o_l = _transform_point(group.w2l[i], origin)
            d_l = _transform_dir(group.w2l[i], direction)
            # already-occluded lanes trace with tmax=0 (free in-kernel)
            lane_tmax = jnp.where(occluded, 0.0,
                                  jnp.broadcast_to(
                                      jnp.asarray(t_max, jnp.float32),
                                      shape))
            if group.tri_packet is not None and _use_pallas() \
                    and len(shape) == 1:
                from metal_pathtracer_tpu.ops.pallas.traverse import (
                    packet_trace,
                )
                _, tri, _, _ = packet_trace(o_l, d_l, t_min, lane_tmax,
                                            group.tri_packet, any_hit=True)
                occluded = occluded | (tri >= 0)
            else:
                rec = trace_triangles(o_l, d_l, _GroupSceneView(group),
                                      t_min, lane_tmax)
                occluded = occluded | rec.hit
    return occluded

"""The fused path's merged trace vs intersect.trace_scene, directly.

The image-level parity tests (test_fused_shade.py) exercise whole
renders; this fuzzes the hit-merge itself: for random mixed scenes
(soup triangles + spheres + rects + instanced groups) and random rays,
shade._trace_merged must reproduce trace_scene's (hit, t, family,
index) exactly, and _occluded_merged must reproduce trace_occluded.
CPU: both sides take the same jnp dispatchers, so equality is exact.
"""

import math

import numpy as np
import pytest

from metal_pathtracer_tpu import constants as C
from metal_pathtracer_tpu.scene.resources import (
    Material,
    Mesh,
    Rect,
    SceneResources,
    Sphere,
)


def _random_scene(rng, n_tris=40, n_spheres=12, n_rects=4, instanced=True):
    res = SceneResources()
    m0 = res.add_material(Material(base_color=(0.7, 0.7, 0.7)))
    if n_tris:
        base = rng.uniform(-6, 6, size=(n_tris, 1, 3))
        verts = (base + rng.uniform(-0.7, 0.7, size=(n_tris, 3, 3))
                 ).astype(np.float32)
        v = verts.reshape(-1, 3)
        faces = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
        normals = np.tile(np.array([[0, 1, 0]], np.float32), (len(v), 1))
        uv = np.zeros((len(v), 2), np.float32)
        res.add_mesh(Mesh(name="soup", vertices=v, normals=normals,
                          uv0=uv, uv1=uv.copy(),
                          tangents=np.zeros((len(v), 4), np.float32),
                          indices=faces, material=m0))
    for _ in range(n_spheres):
        c = rng.uniform(-6, 6, 3)
        res.spheres.append(Sphere(center=tuple(float(x) for x in c),
                                  radius=float(rng.uniform(0.2, 1.0)),
                                  material=m0))
    for _ in range(n_rects):
        corner = rng.uniform(-6, 6, 3).astype(np.float32)
        eu = rng.normal(size=3).astype(np.float32)
        ev = rng.normal(size=3).astype(np.float32)
        nrm = np.cross(eu, ev)
        nl = np.linalg.norm(nrm)
        if nl < 1e-6:
            continue
        res.rects.append(Rect(corner=corner, edge_u=eu, edge_v=ev,
                              normal=(nrm / nl).astype(np.float32),
                              material=m0, two_sided=bool(rng.integers(2))))
    if instanced:
        base = rng.uniform(-2, 2, size=(8, 1, 3))
        verts = (base + rng.uniform(-0.5, 0.5, size=(8, 3, 3))
                 ).astype(np.float32)
        v = verts.reshape(-1, 3)
        faces = np.arange(24, dtype=np.int32).reshape(-1, 3)
        normals = np.tile(np.array([[0, 1, 0]], np.float32), (len(v), 1))
        uv = np.zeros((len(v), 2), np.float32)
        src = Mesh(name="inst", vertices=v, normals=normals, uv0=uv,
                   uv1=uv.copy(),
                   tangents=np.zeros((len(v), 4), np.float32),
                   indices=faces, material=m0)
        for k in range(2):
            ry = float(rng.uniform(0, math.pi))
            cs, sn = math.cos(ry), math.sin(ry)
            m = np.eye(4)
            m[:3, :3] = np.array([[cs, 0, sn], [0, 1, 0],
                                  [-sn, 0, cs]]) * (0.7 + 0.4 * k)
            m[:3, 3] = rng.uniform(-4, 4, 3)
            res.add_mesh_instance(src, m)
    return res


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_trace_merged_matches_trace_scene(seed):
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops import intersect
    from metal_pathtracer_tpu.ops.pallas import shade

    rng = np.random.default_rng(seed)
    res = _random_scene(rng, instanced=(seed != 1),
                        n_tris=0 if seed == 2 else 40)
    scene = res.build_arrays()

    n = 512
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o3, d3 = jnp.asarray(o), jnp.asarray(d)
    lane_tmax = jnp.full((n,), C.INFINITY_T, jnp.float32)

    rec = intersect.trace_scene(o3, d3, scene, C.EPSILON_T, lane_tmax)
    t, idx, u, v, rows, kind = shade._trace_merged(
        scene, o3, d3, C.EPSILON_T, lane_tmax, None, None)

    hit_ref = np.asarray(rec.hit)
    hit_got = np.asarray(idx) >= 0
    np.testing.assert_array_equal(hit_ref, hit_got)
    np.testing.assert_array_equal(
        np.asarray(rec.prim_type)[hit_ref],
        np.asarray(kind).astype(np.int32)[hit_ref])
    np.testing.assert_array_equal(
        np.asarray(rec.prim_index)[hit_ref],
        np.asarray(idx).astype(np.int32)[hit_ref])
    np.testing.assert_array_equal(np.asarray(rec.t)[hit_ref],
                                  np.asarray(t)[hit_ref])
    np.testing.assert_array_equal(np.asarray(rec.material)[hit_ref],
                                  np.asarray(rows)[hit_ref, 18].astype(
                                      np.int32))
    np.testing.assert_array_equal(np.asarray(rec.mesh_index)[hit_ref],
                                  np.asarray(rows)[hit_ref, 19].astype(
                                      np.int32))
    # raw normal faceforwards back to the record's normal for non-plain
    # flavors (plain triangles reconstruct in-kernel instead)
    flavor = np.asarray(rows)[:, 21]
    nt = hit_ref & (flavor != 1.0)
    raw = np.asarray(rows)[:, 9:12]
    front = np.asarray(rec.front_face)
    nf = np.where(front[:, None], raw, -raw)
    np.testing.assert_array_equal(nf[nt], np.asarray(rec.normal)[nt])


@pytest.mark.parametrize("seed", [0, 3])
def test_occluded_merged_matches_trace_occluded(seed):
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops import intersect
    from metal_pathtracer_tpu.ops.pallas import shade

    rng = np.random.default_rng(seed)
    res = _random_scene(rng)
    scene = res.build_arrays()

    n = 512
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o3, d3 = jnp.asarray(o), jnp.asarray(d)
    # mixed windows incl. zero (dead lanes) and short segments
    tmax = jnp.asarray(
        rng.choice([0.0, 2.5, C.INFINITY_T], size=n).astype(np.float32))

    ref = intersect.trace_occluded(o3, d3, scene, C.EPSILON_T, tmax)
    got = shade._occluded_merged(scene, o3, d3, C.EPSILON_T, tmax)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

"""Pallas TPU kernels for analytic primitive intersection.

The hot inner loops of sphere/rectangle scenes. The jnp formulation in
ops/intersect.py materializes (lanes x prims) intermediates in HBM — fine
for correctness, bandwidth-bound at scale. These kernels keep the whole
primitive set in VMEM (<= 512 spheres * 4 floats = 8 KB;
reference caps: MetalShaderTypes.h:15-17) and loop primitives per
ray-block entirely on-chip, so HBM traffic is one read of the rays and one
write of the hits.

Numerics follow hit_sphere / hit_rectangle exactly
(reference: pathtrace.metal:1239-1319), including the reference's
sequential closest-so-far root selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES  # rays per grid step


def _pad_rows(n):
    return ((n + BLOCK - 1) // BLOCK) * BLOCK // LANES


SPHERE_CHUNK = 8  # primitives per padded storage row


def _sphere_kernel(n_spheres: int, t_min: float,
                   ox, oy, oz, dx, dy, dz, tmax,
                   sph, best_t_ref, best_i_ref):
    """Per grid step: a (SUBBLOCK,128) ray tile against every sphere.
    Sphere parameters are scalar VMEM reads; the per-sphere math runs
    full-tile on the VPU (the lane-parallel version of the reference's
    per-thread loop, pathtrace.metal brute_force_hit_spheres:1683-1708)."""
    a = dx[:] * dx[:] + dy[:] * dy[:] + dz[:] * dz[:]
    inv_a = 1.0 / a

    def body(s, carry):
        best_t, best_i = carry
        cx = sph[0, s]
        cy = sph[1, s]
        cz = sph[2, s]
        r = sph[3, s]
        ocx = ox[:] - cx
        ocy = oy[:] - cy
        ocz = oz[:] - cz
        half_b = ocx * dx[:] + ocy * dy[:] + ocz * dz[:]
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a * c
        sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = (-half_b - sqrt_d) * inv_a
        t_far = (-half_b + sqrt_d) * inv_a
        near_ok = (t_near >= t_min) & (t_near <= best_t)
        far_ok = (t_far >= t_min) & (t_far <= best_t)
        t = jnp.where(near_ok, t_near, t_far)
        take = (disc >= 0.0) & (near_ok | far_ok) & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_i = jnp.where(take, s, best_i)
        return best_t, best_i

    best_t0 = tmax[:]
    best_i0 = jnp.full(best_t0.shape, -1, jnp.int32)
    best_t, best_i = jax.lax.fori_loop(0, n_spheres, body, (best_t0, best_i0))
    best_t_ref[:] = best_t
    best_i_ref[:] = best_i


SUBBLOCK = 64             # sublane rows per grid step
RAY_BLOCK = SUBBLOCK * LANES  # rays per grid step


@functools.partial(jax.jit, static_argnames=("n_spheres", "t_min"))
def _sphere_call(origin2, direction2, tmax2, sph, n_spheres, t_min):
    rows = origin2[0].shape[0]
    grid = rows // SUBBLOCK
    ray_spec = pl.BlockSpec((SUBBLOCK, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((4, sph.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_sphere_kernel, n_spheres, t_min),
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [sph_spec],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
    )(*origin2, *direction2, tmax2, sph)


def sphere_nearest(origin, direction, t_min, t_max, centers, radii):
    """Nearest sphere hit via the Pallas kernel.

    origin/direction: (N,3); t_max: (N,) or scalar.
    Returns (best_t (N,), best_index (N,) with -1 for miss).
    """
    n = origin.shape[0]
    s = centers.shape[0]
    rows = ((n + RAY_BLOCK - 1) // RAY_BLOCK) * SUBBLOCK
    padded = rows * LANES

    def pad(v, fill=0.0):
        return jnp.pad(v, (0, padded - n),
                       constant_values=fill).reshape(rows, LANES)

    o2 = tuple(pad(origin[:, i]) for i in range(3))
    d2 = tuple(pad(direction[:, i], fill=1.0) for i in range(3))
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tm2 = pad(tmax_arr)

    s_pad = ((s + LANES - 1) // LANES) * LANES
    sph = jnp.zeros((4, s_pad), jnp.float32)
    sph = sph.at[0, :s].set(centers[:, 0])
    sph = sph.at[1, :s].set(centers[:, 1])
    sph = sph.at[2, :s].set(centers[:, 2])
    sph = sph.at[3, :s].set(radii)

    best_t, best_i = _sphere_call(o2, d2, tm2, sph, s, float(t_min))
    return best_t.reshape(-1)[:n], best_i.reshape(-1)[:n]


def _rect_kernel(n_rects: int, t_min: float,
                 ox, oy, oz, dx, dy, dz, tmax,
                 rect, best_t_ref, best_i_ref):
    """Rect data is a (15, R_pad) VMEM plane read scalar-wise per rect;
    rows: corner(3) edgeU(3) edgeV(3) invLen2U invLen2V normal(3) plane
    (reference: hit_rectangle, pathtrace.metal:1280-1319)."""

    def body(s, carry):
        best_t, best_i = carry
        nx = rect[11, s]
        ny = rect[12, s]
        nz = rect[13, s]
        plane = rect[14, s]
        denom = nx * dx[:] + ny * dy[:] + nz * dz[:]
        safe = jnp.where(jnp.abs(denom) < 1e-6, 1.0, denom)
        t = (plane - (nx * ox[:] + ny * oy[:] + nz * oz[:])) / safe
        px = ox[:] + t * dx[:] - rect[0, s]
        py = oy[:] + t * dy[:] - rect[1, s]
        pz = oz[:] + t * dz[:] - rect[2, s]
        u = (px * rect[3, s] + py * rect[4, s] + pz * rect[5, s]) * rect[9, s]
        v = (px * rect[6, s] + py * rect[7, s] + pz * rect[8, s]) * rect[10, s]
        take = ((jnp.abs(denom) >= 1e-6) & (t >= t_min) & (t < best_t)
                & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0))
        best_t = jnp.where(take, t, best_t)
        best_i = jnp.where(take, s, best_i)
        return best_t, best_i

    best_t0 = tmax[:]
    best_i0 = jnp.full(best_t0.shape, -1, jnp.int32)
    best_t, best_i = jax.lax.fori_loop(0, n_rects, body, (best_t0, best_i0))
    best_t_ref[:] = best_t
    best_i_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("n_rects", "t_min"))
def _rect_call(origin2, direction2, tmax2, rect, n_rects, t_min):
    rows = origin2[0].shape[0]
    grid = rows // SUBBLOCK
    ray_spec = pl.BlockSpec((SUBBLOCK, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rect_spec = pl.BlockSpec((16, rect.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_rect_kernel, n_rects, t_min),
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [rect_spec],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
    )(*origin2, *direction2, tmax2, rect)


def rect_nearest(origin, direction, t_min, t_max, rects_soa):
    """Nearest rectangle hit via the Pallas kernel. Returns (t, index)."""
    n = origin.shape[0]
    r = rects_soa.count
    rows = ((n + RAY_BLOCK - 1) // RAY_BLOCK) * SUBBLOCK
    padded = rows * LANES

    def pad(v, fill=0.0):
        return jnp.pad(v, (0, padded - n),
                       constant_values=fill).reshape(rows, LANES)

    o2 = tuple(pad(origin[:, i]) for i in range(3))
    d2 = tuple(pad(direction[:, i], fill=1.0) for i in range(3))
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tm2 = pad(tmax_arr)

    r_pad = ((r + LANES - 1) // LANES) * LANES
    rect = jnp.zeros((16, r_pad), jnp.float32)
    rect = rect.at[0:3, :r].set(rects_soa.corner.T)
    rect = rect.at[3:6, :r].set(rects_soa.edge_u.T)
    rect = rect.at[6:9, :r].set(rects_soa.edge_v.T)
    rect = rect.at[9, :r].set(rects_soa.inv_len2_u)
    rect = rect.at[10, :r].set(rects_soa.inv_len2_v)
    rect = rect.at[11:14, :r].set(rects_soa.normal.T)
    rect = rect.at[14, :r].set(rects_soa.plane)

    best_t, best_i = _rect_call(o2, d2, tm2, rect, r, float(t_min))
    return best_t.reshape(-1)[:n], best_i.reshape(-1)[:n]

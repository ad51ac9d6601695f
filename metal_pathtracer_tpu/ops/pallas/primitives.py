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


@functools.partial(jax.jit, static_argnames=("n_spheres", "t_min",
                                             "interpret"))
def _sphere_call(origin2, direction2, tmax2, sph, n_spheres, t_min,
                 interpret=False):
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
        interpret=interpret,
    )(*origin2, *direction2, tmax2, sph)


def sphere_nearest(origin, direction, t_min, t_max, centers, radii):
    """Nearest sphere hit via the Pallas kernel.

    origin/direction: (N,3); t_max: (N,) or scalar.
    Returns (best_t (N,), best_index (N,) with -1 for miss).

    Scenes with more than 2 chunks' worth of spheres route to the
    Morton-chunked culling kernel (the reference's sphere-BVH analogue,
    BvhBuilder.mm:26-166) unless MPT_SPHERE_BVH=0.
    """
    import os

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

    n_chunks_needed = (s + SPHERE_GROUP - 1) // SPHERE_GROUP
    chunked = (s > 2 * SPHERE_GROUP
               and n_chunks_needed <= LANES  # one verdict row of lanes
               and os.environ.get("MPT_SPHERE_BVH", "1") == "1")
    interpret = os.environ.get("MPT_PALLAS_INTERPRET", "0") == "1"
    if chunked:
        order = _morton_order(centers)
        c_sorted = centers[order]
        r_sorted = radii[order]
        n_chunks = (s + SPHERE_GROUP - 1) // SPHERE_GROUP
        s_full = n_chunks * SPHERE_GROUP
        # pad by repeating the last sphere: duplicates produce the same
        # (t, original index), so they cannot change any result
        rep = jnp.arange(s_full)
        rep = jnp.minimum(rep, s - 1)
        c_full = c_sorted[rep]
        r_full = r_sorted[rep]
        i_full = order[rep].astype(jnp.float32)
        s_pad = ((s_full + LANES - 1) // LANES) * LANES
        sph = jnp.zeros((5, s_pad), jnp.float32)
        sph = sph.at[0, :s_full].set(c_full[:, 0])
        sph = sph.at[1, :s_full].set(c_full[:, 1])
        sph = sph.at[2, :s_full].set(c_full[:, 2])
        sph = sph.at[3, :s_full].set(r_full)
        sph = sph.at[4, :s_full].set(i_full)
        cg = c_full.reshape(n_chunks, SPHERE_GROUP, 3)
        rg = r_full.reshape(n_chunks, SPHERE_GROUP, 1)
        k_pad = ((n_chunks + LANES - 1) // LANES) * LANES
        boxes = jnp.zeros((6, k_pad), jnp.float32)
        boxes = boxes.at[0:3, :n_chunks].set(
            jnp.min(cg - rg, axis=1).T)
        boxes = boxes.at[3:6, :n_chunks].set(
            jnp.max(cg + rg, axis=1).T)
        best_t, best_i = _sphere_call_chunked(o2, d2, tm2, sph, boxes,
                                              n_chunks, float(t_min),
                                              interpret)
        return best_t.reshape(-1)[:n], best_i.reshape(-1)[:n]

    s_pad = ((s + LANES - 1) // LANES) * LANES
    sph = jnp.zeros((4, s_pad), jnp.float32)
    sph = sph.at[0, :s].set(centers[:, 0])
    sph = sph.at[1, :s].set(centers[:, 1])
    sph = sph.at[2, :s].set(centers[:, 2])
    sph = sph.at[3, :s].set(radii)

    best_t, best_i = _sphere_call(o2, d2, tm2, sph, s, float(t_min),
                                  interpret)
    return best_t.reshape(-1)[:n], best_i.reshape(-1)[:n]


SPHERE_GROUP = 16   # spheres per cull chunk (chunked kernel)


def _sphere_kernel_chunked(n_chunks: int, t_min: float,
                           ox, oy, oz, dx, dy, dz, tmax,
                           sph, boxes, best_t_ref, best_i_ref,
                           verdict_vmem, verdict_smem, vsem):
    """Sphere-BVH analogue (reference: BvhBuilder.mm:26-166 sphere BVH +
    SceneAccel.mm:66-147 sphere path): spheres are Morton-ordered and
    grouped into SPHERE_GROUP chunks with precomputed AABBs; a packet
    slab-tests all chunk AABBs first (batched into one verdict DMA, the
    traversal kernel's proven pattern), then quadratic-tests only chunks
    some lane's window reaches. sph row 4 carries the pre-sort sphere
    index so hits report original ids. Culling is conservative (margins
    use the initial window, which only shrinks) and the per-sphere math
    matches the brute kernel exactly, so results are identical except
    when two spheres hit at the exact same f32 t: the strict `<` keeps
    the first TESTED sphere, which is Morton order here vs declaration
    order there (coincident-surface ties; the parity test uses disjoint
    spheres)."""
    a = dx[:] * dx[:] + dy[:] * dy[:] + dz[:] * dz[:]
    inv_a = 1.0 / a

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                               jnp.where(d >= 0, 1e-20, -1e-20), d)

    inv_dx = safe_inv(dx[:])
    inv_dy = safe_inv(dy[:])
    inv_dz = safe_inv(dz[:])
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # phase 1: all chunk-AABB margins vs the initial window (conservative:
    # the window only shrinks), batched into one DMA to scalar memory
    acc = jnp.full((1, LANES), -1.0, jnp.float32)
    for k in range(n_chunks):
        t0x = (boxes[0, k] - ox[:]) * inv_dx
        t1x = (boxes[3, k] - ox[:]) * inv_dx
        t0y = (boxes[1, k] - oy[:]) * inv_dy
        t1y = (boxes[4, k] - oy[:]) * inv_dy
        t0z = (boxes[2, k] - oz[:]) * inv_dz
        t1z = (boxes[5, k] - oz[:]) * inv_dz
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), t_min))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), tmax[:]))
        margin = jnp.max(tfar - tnear, keepdims=True).reshape(1, 1)
        acc = jnp.where(lane_iota == k, margin, acc)
    verdict_vmem[0:1, :] = acc
    dma = pltpu.make_async_copy(verdict_vmem, verdict_smem, vsem)
    dma.start()
    dma.wait()

    # phase 2: quadratic tests for passing chunks only
    best_t_ref[:] = tmax[:]
    best_i_ref[:] = jnp.full(tmax.shape, -1.0, jnp.float32)
    for k in range(n_chunks):
        @pl.when(verdict_smem[0, k] >= 0.0)
        def _():
            best_t = best_t_ref[:]
            best_i = best_i_ref[:]
            for j in range(SPHERE_GROUP):
                s = k * SPHERE_GROUP + j
                cx = sph[0, s]
                cy = sph[1, s]
                cz = sph[2, s]
                r = sph[3, s]
                orig = sph[4, s]
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
                best_i = jnp.where(take, orig, best_i)
            best_t_ref[:] = best_t
            best_i_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("n_chunks", "t_min",
                                             "interpret"))
def _sphere_call_chunked(origin2, direction2, tmax2, sph, boxes, n_chunks,
                         t_min, interpret=False):
    rows = origin2[0].shape[0]
    grid = rows // SUBBLOCK
    ray_spec = pl.BlockSpec((SUBBLOCK, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((5, sph.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    box_spec = pl.BlockSpec((6, boxes.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    best_t, best_i = pl.pallas_call(
        functools.partial(_sphere_kernel_chunked, n_chunks, t_min),
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [sph_spec, box_spec],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.SMEM((1, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*origin2, *direction2, tmax2, sph, boxes)
    return best_t, best_i.astype(jnp.int32)


def _morton_order(centers):
    """Morton order of sphere centers on a 10-bit grid (jnp, trace-time —
    ~512 elements, negligible)."""
    lo = jnp.min(centers, axis=0)
    hi = jnp.max(centers, axis=0)
    q = ((centers - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0)
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.uint32)
    key = jnp.zeros(centers.shape[0], jnp.uint32)
    for b in range(10):
        for axis in range(3):
            key = key | (((q[:, axis] >> b) & 1) << (3 * b + axis))
    return jnp.argsort(key)


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

"""List-driven packet tracer: XLA conservative cull + dense Pallas intersect.

STATUS — EXPERIMENTAL, measured on TPU v5e (dragon-class 328k tris,
1080p; see BENCHMARKS.md):
- exact match vs traverse.packet_trace on all correctness tests;
- coherent primaries: 1.14 Mrays/s vs packet_trace's 9.8 (prep 675 ms +
  kernel 468 ms; the conservative frustum lists average 5.2 chunks/packet
  vs 2.0 per-ray-exact, and full-chunk MT has no sub-chunk gating yet);
- harsh semi-coherent bounces: both paths collapse; the frustum union
  amplifies incoherence (62 s vs packet_trace 6.3 s on a synthetic
  worst case). Conclusion: packet frustum culling cannot fix bounce
  incoherence — ray sorting (ops/raysort.py) + the v1 kernel is the
  production path; this module is kept as the measured baseline for a
  future per-ray-exact cull.

Design rationale, from measured TPU behavior (BENCHMARKS.md):

- Möller–Trumbore pair throughput is layout-invariant on the VPU
  (~70 cycles per 1024 ray-triangle pairs); the only wins available are
  (a) fewer pairs (tighter culling, smaller packets), (b) no dependent
  scalar loads, (c) hidden DMAs.
- The v1 kernel's per-wave *dependent* SMEM loads (pop -> node -> bounds)
  cost ~0.3-1us each; with hundreds of node visits per packet they dominate
  the frame. Here the candidate list per packet is precomputed by XLA, so
  every in-kernel load is independent and pipelines.

Pipeline per trace call:
1. Rays are grouped into 128-ray packets (inheriting the renderer's
   tile-coherent order, renderer/frame.py).
2. XLA computes a conservative interval slab test of every packet against
   every leaf-chunk AABB (scene/packetbvh.py `chunk_aabb`) — a dense
   (P, C) computation the VPU eats — and emits per-packet entry-sorted
   candidate chunk lists via `lax.top_k`.
3. The Pallas kernel walks each packet's list: DMA chunk (16, 256) planes
   HBM->VMEM, then dense Möller–Trumbore in *octet layout*: each VPU op
   intersects 8 rays x 128 triangles via (8,1) x (1,128) broadcasts
   (reference math: pathtrace.metal:544-592). Every 4 chunks the packet's
   max hit distance is reduced and compared against the next candidate's
   entry bound for early exit (occlusion cut).
4. Packets whose candidates overflow the list length are finished by
   further rounds (rare: silhouette-grazing packets).

Reference behavior preserved: nearest hit, parametric t in units of the
unnormalized direction, per-ray triangle-id exclusion for self-hit
avoidance (reference: pathtrace.metal:2796).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_pathtracer_tpu.scene.packetbvh import PLANES, PacketBvh

LANES = 128
PACKET = 128          # rays per packet
OCTETS = PACKET // 8  # 16 ray octets
LIST_LEN = 128        # candidate chunks per packet per round
EXIT_PERIOD = 4       # chunks between occlusion-cut checks

# ray lane layout: lane 8k+a holds attr a of octet k
A_OX, A_OY, A_OZ, A_DX, A_DY, A_DZ, A_TMAX, A_EXCL = range(8)
# best lane layout: lane 8k+f
F_T, F_TRI, F_U, F_V = range(4)

BIG = 3.0e38


def _kernel(t_min: float, chunk_sz: int,
            rays_ref, best_ref, clist, centry, ccount, chunks,
            out_ref, buf, sem, maxt_vmem, maxt_smem, msem):
    halves = chunk_sz // LANES
    count = ccount[0, 0, 0]
    rays = rays_ref[0]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

    def mt_chunk(best, valid_chunk):
        """Dense Möller–Trumbore of the DMA'd chunk vs the whole packet."""
        for h in range(halves):
            lo = h * LANES
            v0x = buf[0:1, lo:lo + LANES]
            v0y = buf[1:2, lo:lo + LANES]
            v0z = buf[2:3, lo:lo + LANES]
            e1x = buf[3:4, lo:lo + LANES]
            e1y = buf[4:5, lo:lo + LANES]
            e1z = buf[5:6, lo:lo + LANES]
            e2x = buf[6:7, lo:lo + LANES]
            e2y = buf[7:8, lo:lo + LANES]
            e2z = buf[8:9, lo:lo + LANES]
            tid = buf[10:11, lo:lo + LANES]
            valid = buf[11:12, lo:lo + LANES]
            for k in range(OCTETS):
                b = 8 * k
                o_x = rays[:, b + A_OX:b + A_OX + 1]
                o_y = rays[:, b + A_OY:b + A_OY + 1]
                o_z = rays[:, b + A_OZ:b + A_OZ + 1]
                d_x = rays[:, b + A_DX:b + A_DX + 1]
                d_y = rays[:, b + A_DY:b + A_DY + 1]
                d_z = rays[:, b + A_DZ:b + A_DZ + 1]
                excl = rays[:, b + A_EXCL:b + A_EXCL + 1]
                bt = best[:, b + F_T:b + F_T + 1]

                pvx = d_y * e2z - d_z * e2y
                pvy = d_z * e2x - d_x * e2z
                pvz = d_x * e2y - d_y * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
                tvx = o_x - v0x
                tvy = o_y - v0y
                tvz = o_z - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                take = ((jnp.abs(det) >= 1e-8)
                        & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0)
                        & (t >= t_min) & (t < bt)
                        & (valid > 0.5) & (tid != excl)
                        & valid_chunk)

                tt = jnp.where(take, t, BIG)
                tmin = jnp.min(tt, axis=1, keepdims=True)        # (8,1)
                improved = tmin < bt
                eq = tt == tmin
                # deterministic winner on ties: lowest triangle id
                idw = jnp.min(jnp.where(eq, tid, BIG), axis=1, keepdims=True)
                sel = eq & (tid == idw)
                uw = jnp.min(jnp.where(sel, u, BIG), axis=1, keepdims=True)
                vw = jnp.min(jnp.where(sel, v, BIG), axis=1, keepdims=True)

                # scatter the 4 best lanes of octet k
                best = jnp.where((lane_iota == b + F_T) & improved, tmin, best)
                best = jnp.where((lane_iota == b + F_TRI) & improved, idw, best)
                best = jnp.where((lane_iota == b + F_U) & improved, uw, best)
                best = jnp.where((lane_iota == b + F_V) & improved, vw, best)
        return best

    def outer_cond(carry):
        m, done, _ = carry
        return (m < count) & jnp.logical_not(done)

    def outer_body(carry):
        m, done, best = carry

        def inner(i, best):
            mm = m + i
            cid = clist[0, 0, jnp.minimum(mm, LIST_LEN - 1)]
            # padded list slots may carry out-of-range ids; clamp (masked out
            # of the intersection by mm < count anyway)
            cid = jnp.clip(cid, 0, chunks.shape[0] - 1)
            dma = pltpu.make_async_copy(chunks.at[cid], buf, sem)
            dma.start()
            dma.wait()
            return mt_chunk(best, mm < count)

        best = jax.lax.fori_loop(0, EXIT_PERIOD, inner, best)
        m = m + EXIT_PERIOD

        # occlusion cut: if the (entry-sorted) next candidate's conservative
        # entry bound can no longer beat any ray's best t, the rest of the
        # list is dead. One vector->scalar sync per EXIT_PERIOD chunks.
        t_mask = (lane_iota % 8) == F_T
        mx = jnp.max(jnp.where(t_mask, best, -BIG))
        maxt_vmem[0:1, :] = jnp.full((1, LANES), mx, jnp.float32)
        d2 = pltpu.make_async_copy(maxt_vmem, maxt_smem, msem)
        d2.start()
        d2.wait()
        nxt = centry[0, 0, jnp.minimum(m, LIST_LEN - 1)]
        done = nxt >= maxt_smem[0, 0]
        return m, done, best

    init = (jnp.int32(0), jnp.bool_(False), best_ref[0])
    _, _, best = jax.lax.while_loop(outer_cond, outer_body, init)
    out_ref[0] = best


@functools.partial(jax.jit, static_argnames=("chunk_sz", "t_min"))
def _call(rays_packed, best_packed, clist, centry, ccount, chunk_tris,
          chunk_sz, t_min):
    P = rays_packed.shape[0]
    blk = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(P,),
        in_specs=[
            blk, blk,
            pl.BlockSpec((1, 1, LIST_LEN), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, LIST_LEN), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=blk,
        scratch_shapes=[
            pltpu.VMEM((PLANES, chunk_sz), jnp.float32),  # chunk buffer
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((1, LANES), jnp.float32),          # maxt landing
            pltpu.SMEM((1, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, t_min, chunk_sz),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 8, LANES), jnp.float32),
    )(rays_packed, best_packed, clist, centry, ccount, chunk_tris)


def _pack(cols):
    """[(P,128) x 8 attrs] -> (P, 8, 128) with lane 8k+a = attr a, octet k."""
    arr = jnp.stack(cols, -1)                    # (P, 128, 8)
    P = arr.shape[0]
    arr = arr.reshape(P, OCTETS, 8, 8)           # [p, k, s, a]
    arr = arr.transpose(0, 2, 1, 3)              # [p, s, k, a]
    return arr.reshape(P, 8, LANES)


def _unpack(packed, f):
    """(P, 8, 128) octet layout -> (P, 128) for best field f."""
    P = packed.shape[0]
    arr = packed.reshape(P, 8, OCTETS, 8)        # [p, s, k, a]
    col = arr[:, :, :, f]                        # [p, s, k]
    return col.transpose(0, 2, 1).reshape(P, PACKET)


def _interval_cull(o_pk, d_pk, tmax_pk, chunk_aabb, t_min):
    """Conservative packet-vs-chunk slab test via interval arithmetic.

    Returns entry (P, C): conservative lower bound of any ray's entry t,
    BIG where no ray can possibly hit.
    """
    omin = o_pk.min(1)              # (P,3)
    omax = o_pk.max(1)
    dmin = d_pk.min(1)
    dmax = d_pk.max(1)

    eps = 1e-20
    # interval reciprocal of [dmin, dmax]; sign-mixed packets get a huge
    # interval => always-overlap on that axis (conservative)
    pure = (dmin > 0.0) | (dmax < 0.0)
    inv_lo_pure = 1.0 / jnp.where(jnp.abs(dmax) < eps,
                                  jnp.where(dmax >= 0, eps, -eps), dmax)
    inv_hi_pure = 1.0 / jnp.where(jnp.abs(dmin) < eps,
                                  jnp.where(dmin >= 0, eps, -eps), dmin)
    inv_lo = jnp.where(pure, inv_lo_pure, -1e12)
    inv_hi = jnp.where(pure, inv_hi_pure, 1e12)

    cmin = chunk_aabb[:, 0:3]       # (C,3)
    cmax = chunk_aabb[:, 3:6]

    tn = jnp.full((o_pk.shape[0], chunk_aabb.shape[0]), t_min, jnp.float32)
    tf = jnp.full_like(tn, BIG)
    for ax in range(3):
        blo = cmin[None, :, ax] - omax[:, None, ax]      # (P,C)
        bhi = cmax[None, :, ax] - omin[:, None, ax]
        il = inv_lo[:, None, ax]
        ih = inv_hi[:, None, ax]
        p1 = blo * il
        p2 = blo * ih
        p3 = bhi * il
        p4 = bhi * ih
        lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
        hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
        tn = jnp.maximum(tn, lo)
        tf = jnp.minimum(tf, hi)

    tmax_max = tmax_pk.max(1)       # (P,)
    overlap = (tf >= tn) & (tn <= tmax_max[:, None])
    return jnp.where(overlap, tn, BIG)


def _octant_order(direction, n_padded):
    """Stable counting sort of rays by direction sign octant.

    Sign-mixed packets make the interval cull blow up (an axis whose
    direction interval straddles zero overlaps every chunk along a plane);
    octant-grouped packets are sign-pure by construction. This also groups
    incoherent bounce rays by heading — the cheap half of ray sorting.
    Returns (perm, inv_perm) of length n_padded (tail slots keep identity).
    """
    n = direction.shape[0]
    key = ((direction[:, 0] < 0).astype(jnp.int32)
           + 2 * (direction[:, 1] < 0).astype(jnp.int32)
           + 4 * (direction[:, 2] < 0).astype(jnp.int32))
    key = jnp.pad(key, (0, n_padded - n), constant_values=8)  # tail bucket

    # Blocked counting sort: a flat cumsum over millions of rows lowers to a
    # pathological long scan; block-local ranks + a tiny cross-block scan is
    # a few fast memory passes instead.
    blk = 4096
    nb = (n_padded + blk - 1) // blk
    keyb = jnp.pad(key, (0, nb * blk - n_padded),
                   constant_values=9).reshape(nb, blk)
    onehot = (keyb[:, :, None] == jnp.arange(10)[None, None, :])  # (nb,blk,10)
    local_rank = jnp.cumsum(onehot, axis=1) - 1                   # in-block
    block_counts = jnp.sum(onehot, axis=1)                        # (nb,10)
    block_base = jnp.cumsum(block_counts, axis=0) - block_counts  # excl scan
    bucket_total = jnp.sum(block_counts, axis=0)                  # (10,)
    bucket_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(bucket_total).astype(jnp.int32)[:-1]])
    pos_b = (bucket_base[None, None, :] + block_base[:, None, :]
             + local_rank)                                        # (nb,blk,10)
    pos = jnp.take_along_axis(
        pos_b, keyb[:, :, None], axis=2)[:, :, 0].astype(jnp.int32)
    pos = pos.reshape(-1)[:n_padded]
    perm = jnp.zeros((n_padded,), jnp.int32).at[pos].set(
        jnp.arange(n_padded, dtype=jnp.int32))
    inv = pos
    return perm, inv


WINDOWS = 8  # candidate windows cached per sort pass (MAXL = 8 * LIST_LEN)


def _sorted_candidates(entry):
    """Entry-ascending candidate ids, capped at WINDOWS * LIST_LEN.

    One lax.top_k per pass. (Measured on (16200, 3699): top_k(1024) ~64 ms;
    lax.sort of the same rows 7-33 s — top_k is the only viable selector on
    this backend.)
    """
    C = entry.shape[1]
    maxl = min(WINDOWS * LIST_LEN, C)
    neg, ids = jax.lax.top_k(-entry, maxl)
    ents = -neg
    if maxl < WINDOWS * LIST_LEN:
        padw = WINDOWS * LIST_LEN - maxl
        ents = jnp.pad(ents, ((0, 0), (0, padw)), constant_values=BIG)
        ids = jnp.pad(ids, ((0, 0), (0, padw)), constant_values=0)
    return ids.astype(jnp.int32), ents


def cull_trace(origin, direction, t_min, t_max, bvh: PacketBvh,
               exclude_prim=None):
    """Nearest triangle hit for a flat wavefront (culltrace path).

    Same contract as traverse.packet_trace: returns (t, tri (-1 miss), u, v).
    """
    n = origin.shape[0]
    P = (n + PACKET - 1) // PACKET
    padded = P * PACKET

    perm, inv = _octant_order(direction, padded)

    def pad_perm(v, fill=0.0):
        out = jnp.full((padded,), fill, v.dtype)
        out = out.at[jnp.arange(n)].set(v)
        return out[perm].reshape(P, PACKET)

    ox = pad_perm(origin[:, 0])
    oy = pad_perm(origin[:, 1])
    oz = pad_perm(origin[:, 2])
    dx = pad_perm(direction[:, 0], fill=1.0)
    dy = pad_perm(direction[:, 1], fill=1.0)
    dz = pad_perm(direction[:, 2], fill=1.0)
    tmax = pad_perm(jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), (n,)), fill=0.0)
    if exclude_prim is None:
        excl = jnp.full((n,), -1.0, jnp.float32)
    else:
        excl = exclude_prim.astype(jnp.float32)
    excl = pad_perm(excl, fill=-1.0)

    rays_packed = _pack([ox, oy, oz, dx, dy, dz, tmax, excl])
    zero = jnp.zeros_like(tmax)
    best_packed = _pack([tmax, zero - 1.0, zero, zero,
                         zero, zero, zero, zero])

    o_pk = jnp.stack([ox, oy, oz], -1)      # (P,128,3)
    d_pk = jnp.stack([dx, dy, dz], -1)
    entry0 = _interval_cull(o_pk, d_pk, tmax, bvh.chunk_aabb, float(t_min))

    chunk_sz = bvh.chunk_tris.shape[2]
    maxl = WINDOWS * LIST_LEN
    max_passes = (bvh.chunk_tris.shape[0] + maxl - 1) // maxl

    def window_round(w, carry):
        ids, ents, best_packed = carry
        wids = jax.lax.dynamic_slice_in_dim(ids, w * LIST_LEN, LIST_LEN, 1)
        wents = jax.lax.dynamic_slice_in_dim(ents, w * LIST_LEN, LIST_LEN, 1)
        counts = jnp.sum(wents < BIG, axis=1).astype(jnp.int32)
        # occlusion gate: skip packets whose first remaining candidate
        # cannot beat their worst ray
        best_t = _unpack(best_packed, F_T)
        maxt = best_t.max(1)
        live = wents[:, 0] < jnp.minimum(maxt, BIG)
        counts = jnp.where(live, counts, 0)
        best_packed = _call(rays_packed, best_packed,
                            wids[:, None, :], wents[:, None, :],
                            counts[:, None, None],
                            bvh.chunk_tris, chunk_sz, float(t_min))
        return ids, ents, best_packed

    def pass_cond(carry):
        p, live_any, _, _ = carry
        return (p < max_passes) & live_any

    def pass_body(carry):
        p, _, entry, best_packed = carry
        ids, ents = _sorted_candidates(entry)
        _, _, best_packed = jax.lax.fori_loop(
            0, WINDOWS, window_round, (ids, ents, best_packed))
        # retire exactly the ids this pass covered (tie-safe)
        rows = jnp.arange(entry.shape[0])[:, None]
        entry = entry.at[rows, ids].set(BIG)
        best_t = _unpack(best_packed, F_T)
        maxt = best_t.max(1)
        remaining = entry.min(1)
        live_any = jnp.any(remaining < jnp.minimum(maxt, BIG))
        return p + 1, live_any, entry, best_packed

    carry = (jnp.int32(0), jnp.bool_(True), entry0, best_packed)
    _, _, _, best_packed = jax.lax.while_loop(pass_cond, pass_body, carry)

    def unperm(x):
        return x.reshape(-1)[inv][:n]

    t = unperm(_unpack(best_packed, F_T))
    tri_f = unperm(_unpack(best_packed, F_TRI))
    u = unperm(_unpack(best_packed, F_U))
    v = unperm(_unpack(best_packed, F_V))
    tri = jnp.where(tri_f < 0.0, -1, tri_f.astype(jnp.int32))
    u = jnp.where(tri >= 0, u, 0.0)
    v = jnp.where(tri >= 0, v, 0.0)
    return t, tri, u, v

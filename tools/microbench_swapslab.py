#!/usr/bin/env python
"""Probe: octant-uniform slab tests — skip the per-axis min/max pairs.

When every alive lane of a packet shares all three direction signs
(octant-pure — true for primaries and for post-compaction octmorton
bounce segments), the near/far bound per axis is the SAME box corner for
every lane, so it can be picked scalar-side (SMEM select) and the vector
slab test drops the per-axis min/max:

  generic per axis:  t0=(bmin-o)*inv, t1=(bmax-o)*inv, min, max  (6 ops)
  uniform per axis:  tn=(bnear-o)*inv, tf=(bfar-o)*inv            (4 ops)

= 6 of ~21 vector ops removed (~28%). This probe times the two forms on
the madd-microbench loop (SMEM box loads, scalar-select near/far in the
swap mode) to decide whether the kernel's slab site is op-bound enough
to justify the dual-path (pure/mixed) kernel surgery.

Measurement rules per BENCHMARKS.md: fetch a reduced scalar only, probe
>100 ms, interleaved same-process medians.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAYROWS = 8
LANES = 128
NBOX = 512
REPS = 1024


def _kernel(mode, ox, oy, oz, ix, iy, iz, boxes, sgn, out):
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def box_body_generic(k, acc):
        t0x = (boxes[0, k] - ox[:]) * ix[:]
        t1x = (boxes[3, k] - ox[:]) * ix[:]
        t0y = (boxes[1, k] - oy[:]) * iy[:]
        t1y = (boxes[4, k] - oy[:]) * iy[:]
        t0z = (boxes[2, k] - oz[:]) * iz[:]
        t1z = (boxes[5, k] - oz[:]) * iz[:]
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.minimum(t0z, t1z))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        m = jnp.max(tfar - tnear, keepdims=True).reshape(1, 1)
        return jnp.where(lane_iota == jax.lax.rem(k, LANES), m, acc)

    def box_body_swap(k, acc):
        # scalar-side near/far select per axis (sgn holds 0/1 per axis)
        bnx = jnp.where(sgn[0] > 0, boxes[0, k], boxes[3, k])
        bfx = jnp.where(sgn[0] > 0, boxes[3, k], boxes[0, k])
        bny = jnp.where(sgn[1] > 0, boxes[1, k], boxes[4, k])
        bfy = jnp.where(sgn[1] > 0, boxes[4, k], boxes[1, k])
        bnz = jnp.where(sgn[2] > 0, boxes[2, k], boxes[5, k])
        bfz = jnp.where(sgn[2] > 0, boxes[5, k], boxes[2, k])
        tnx = (bnx - ox[:]) * ix[:]
        tfx = (bfx - ox[:]) * ix[:]
        tny = (bny - oy[:]) * iy[:]
        tfy = (bfy - oy[:]) * iy[:]
        tnz = (bnz - oz[:]) * iz[:]
        tfz = (bfz - oz[:]) * iz[:]
        tnear = jnp.maximum(jnp.maximum(tnx, tny), tnz)
        tfar = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
        m = jnp.max(tfar - tnear, keepdims=True).reshape(1, 1)
        return jnp.where(lane_iota == jax.lax.rem(k, LANES), m, acc)

    def slab(k):
        t0x = (boxes[0, k] - ox[:]) * ix[:]
        t1x = (boxes[3, k] - ox[:]) * ix[:]
        t0y = (boxes[1, k] - oy[:]) * iy[:]
        t1y = (boxes[4, k] - oy[:]) * iy[:]
        t0z = (boxes[2, k] - oz[:]) * iz[:]
        t1z = (boxes[5, k] - oz[:]) * iz[:]
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.minimum(t0z, t1z))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        return tnear, tfar

    if mode == "noreduce":
        # no cross-lane reduce, no lane-place: elementwise accumulate —
        # isolates the reduce + loop-carried select latency
        def rep_body(r, acc):
            def bb(i, a):
                tnear, tfar = slab(jax.lax.rem(i + r, NBOX))
                return a + (tfar - tnear)
            return jax.lax.fori_loop(0, NBOX, bb, acc)

        acc = jax.lax.fori_loop(0, REPS, rep_body,
                                jnp.zeros((RAYROWS, LANES), jnp.float32))
        out[0:1, :] = acc[0:1, :]
        return
    if mode == "noload":
        # constant box (loads hoisted): isolates the 6 dynamic SMEM
        # scalar loads per box
        def rep_body(r, acc):
            def bb(i, a):
                tnear, tfar = slab(jax.lax.rem(r, NBOX))
                m = jnp.max(tfar - tnear, keepdims=True).reshape(1, 1)
                return jnp.where(lane_iota == jax.lax.rem(i, LANES), m, a)
            return jax.lax.fori_loop(0, NBOX, bb, acc)

        out[0:1, :] = jax.lax.fori_loop(
            0, REPS, rep_body, jnp.zeros((1, LANES), jnp.float32))
        return
    if mode == "unroll4":
        # 4 boxes per step, one shared acc: independent load/slab/reduce
        # chains expose instruction-level parallelism to Mosaic
        def rep_body(r, acc):
            def bb(q, a):
                for u in range(4):
                    k = jax.lax.rem(4 * q + u + r, NBOX)
                    tnear, tfar = slab(k)
                    m = jnp.max(tfar - tnear, keepdims=True).reshape(1, 1)
                    a = jnp.where(lane_iota == jax.lax.rem(4 * q + u, LANES),
                                  m, a)
                return a
            return jax.lax.fori_loop(0, NBOX // 4, bb, acc)

        out[0:1, :] = jax.lax.fori_loop(
            0, REPS, rep_body, jnp.zeros((1, LANES), jnp.float32))
        return

    box_body = box_body_swap if mode == "swap" else box_body_generic

    def rep_body(r, acc):
        return jax.lax.fori_loop(
            0, NBOX, lambda i, a: box_body(jax.lax.rem(i + r, NBOX), a),
            acc)

    out[0:1, :] = jax.lax.fori_loop(0, REPS, rep_body,
                                    jnp.zeros((1, LANES), jnp.float32))


@functools.partial(jax.jit, static_argnames=("mode",))
def run(rays, boxes, sgn, mode):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, mode),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pltpu.SMEM),
                               pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
    )(*rays, boxes, sgn)
    return jnp.sum(out)


def main():
    from metal_pathtracer_tpu.utils.compilecache import enable_cache

    enable_cache()
    rng = np.random.default_rng(0)
    rays = tuple(
        jnp.asarray(rng.uniform(0.5, 2.0, (RAYROWS, LANES)), jnp.float32)
        for _ in range(6))
    boxes = jnp.asarray(rng.uniform(-4.0, 4.0, (8, NBOX)), jnp.float32)
    sgn = jnp.asarray([1, 0, 1], jnp.int32)
    modes = ("generic", "swap", "noreduce", "noload", "unroll4")
    for mode in modes:
        float(run(rays, boxes, sgn, mode))  # compile
    samples = {m: [] for m in modes}
    for _ in range(7):
        for mode in modes:  # interleaved A/B
            t0 = time.time()
            float(run(rays, boxes, sgn, mode))
            samples[mode].append(time.time() - t0)
    meds = {}
    for mode, ts in samples.items():
        ts.sort()
        meds[mode] = ts[len(ts) // 2]
        print(f"{mode}: median {meds[mode]*1e3:.1f} ms")
    for m in modes[1:]:
        print(f"{m} speedup: {meds['generic']/meds[m]:.3f}x")


if __name__ == "__main__":
    main()

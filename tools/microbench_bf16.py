#!/usr/bin/env python
"""Decide BENCHMARKS.md round-4 plan #1: do packed bf16 elementwise ops
run ~2x f32 on the v5e VPU, or does Mosaic upcast them?

Times K chained slab-shaped op bodies (sub, mul, min/max chain — the
exact shape of traverse.py's slab_margin) on (ROWS,128) tiles in f32 vs
bf16 inside one kernel launch, fetching only a reduced scalar
(tpu-axon-measurement-rules: never fetch full arrays; probes must be
>100ms)."""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 256
LANES = 128
K = 4096  # chained bodies per kernel


def _kernel(dtype, a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    one = jnp.asarray(1.0000001, dtype)
    acc = a
    for _ in range(K):
        # slab_margin-shaped body: 2 sub, 2 mul, 4 min/max per "axis" rep
        t0 = (b - acc) * one
        t1 = (acc - b) * one
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        acc = jnp.maximum(jnp.minimum(acc + lo * one, hi), lo)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("dtype",))
def run(a, b, dtype):
    spec = pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, dtype),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), dtype),
    )(a, b)
    return jnp.sum(out.astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.uniform(0.5, 2.0, (ROWS, LANES)), jnp.float32)
    b32 = jnp.asarray(rng.uniform(0.5, 2.0, (ROWS, LANES)), jnp.float32)
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = a32.astype(dtype)
        b = b32.astype(dtype)
        r = run(a, b, dtype)
        float(r)  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(run(a, b, dtype))
            ts.append(time.time() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        ops = K * 7 * ROWS * LANES
        print(f"{name}: median {med*1e3:.1f} ms  "
              f"({ops/med/1e12:.2f} Tops/s elementwise)")


# ---------------------------------------------------------------------------
# Part 2: the REAL question — a slab-test-shaped loop (scalar box loads from
# SMEM + vector min/max chains on ray tiles), f32 one-box-at-a-time vs bf16
# two-boxes-packed into a (16,128) tile. If bf16 wins ~2x here, the
# traversal kernel's verdict phases (90% of divergent-trace cost) can adopt
# conservative bf16 slab tests.

RAYROWS = 8
NBOX = 512    # boxes per pass (dynamic SMEM reads, like the real kernel)
REPS = 128    # passes per kernel call (clears the ~40ms dispatch floor)


def _slab_f32(nbox, ox, oy, oz, ix, iy, iz, boxes, out):
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def rep_body(r, acc):
        return jax.lax.fori_loop(
            0, nbox, lambda i, a: box_body(jax.lax.rem(i + r, nbox), a),
            acc)

    def box_body(k, acc):
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

    out[0:1, :] = jax.lax.fori_loop(0, REPS, rep_body,
                                    jnp.zeros((1, LANES), jnp.float32))


def _slab_bf16(nbox, ox, oy, oz, ix, iy, iz, boxes, out):
    """Two boxes per iteration: box pair (k, k+1) broadcast to the top and
    bottom 8 sublane rows of a (16,128) bf16 tile."""
    half = jax.lax.broadcasted_iota(jnp.int32, (2 * RAYROWS, LANES), 0) \
        < RAYROWS
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def dup(v):  # (8,128) bf16 -> (16,128) stacked twice
        return jnp.concatenate([v, v], axis=0)

    o2x, o2y, o2z = dup(ox[:]), dup(oy[:]), dup(oz[:])
    i2x, i2y, i2z = dup(ix[:]), dup(iy[:]), dup(iz[:])

    def rep_body(r, acc):
        return jax.lax.fori_loop(
            0, nbox // 2,
            lambda i, a: box_body(jax.lax.rem(2 * i + r, nbox - 1), a),
            acc)

    def box_body(k, acc):
        def pick(row):
            a = boxes[row, k]
            b = boxes[row, k + 1]
            return jnp.where(half, a, b).astype(jnp.bfloat16)
        t0x = (pick(0) - o2x) * i2x
        t1x = (pick(3) - o2x) * i2x
        t0y = (pick(1) - o2y) * i2y
        t1y = (pick(4) - o2y) * i2y
        t0z = (pick(2) - o2z) * i2z
        t1z = (pick(5) - o2z) * i2z
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.minimum(t0z, t1z))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        diff = (tfar - tnear).astype(jnp.float32)
        m = jnp.max(diff, keepdims=True).reshape(1, 1)
        return jnp.where(lane_iota == jax.lax.rem(k, LANES), m, acc)

    out[0:1, :] = jax.lax.fori_loop(0, REPS, rep_body,
                                    jnp.zeros((1, LANES), jnp.float32))


@functools.partial(jax.jit, static_argnames=("mode",))
def run_slab(rays, boxes, mode):
    import numpy as _np
    dtype = jnp.float32 if mode == "f32" else jnp.bfloat16
    rows = RAYROWS
    spec = pl.BlockSpec((rows, LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(boxes.shape, lambda: (0, 0),
                            memory_space=pltpu.SMEM)
    kern = _slab_f32 if mode == "f32" else _slab_bf16
    out = pl.pallas_call(
        functools.partial(kern, NBOX),
        in_specs=[spec] * 6 + [box_spec],
        out_specs=pl.BlockSpec((1, LANES), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        interpret=os.environ.get("MPT_PALLAS_INTERPRET", "0") == "1",
    )(*[r.astype(dtype) for r in rays], boxes)
    return jnp.sum(out)


def slab_main():
    rng = np.random.default_rng(1)
    rays = [jnp.asarray(rng.uniform(-5, 5, (RAYROWS, LANES)), jnp.float32)
            for _ in range(6)]
    boxes = jnp.asarray(rng.uniform(-10, 10, (6, NBOX)), jnp.float32)
    for mode in ("f32", "bf16"):
        float(run_slab(rays, boxes, mode))  # compile
        ts = []
        for _ in range(7):
            t0 = time.time()
            float(run_slab(rays, boxes, mode))
            ts.append(time.time() - t0)
        ts.sort()
        print(f"slab {mode}: median {ts[len(ts)//2]*1e3:.1f} ms "
              f"({NBOX} boxes x (8,128) rays)")


if __name__ == "__main__":
    main()
    slab_main()

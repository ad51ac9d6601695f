#!/usr/bin/env python
"""Probe: does rewriting slab tests in precomputed-madd form save VPU ops?

Current traverse.py form per bound:   (b - o) * inv      (sub, then mul —
not a fusable madd pattern). Candidate form: hoist oi = o * inv once per
packet, then per bound:               b * inv - oi       (mul-sub, which
the VPU can issue as one fused multiply-add if Mosaic emits it).

Slab arithmetic is ~90% of divergent-trace kernel cost (BENCHMARKS.md
"Where the time goes"), and 12 of ~21 vector ops per slab test are the
sub/mul pairs — if madd fuses, that is up to ~28% of slab ops removed.
Numerically b*inv - o*inv differs from (b-o)*inv by ulps, so the real
kernel would pair it with an Embree-style robust-epsilon widening of
tfar to stay strictly conservative (box tests only gate; MT decides).

Measurement rules per BENCHMARKS.md: fetch a reduced scalar only, probe
>100 ms, interleaved same-process medians.
"""

import functools
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


def _kernel(mode, ox, oy, oz, ix, iy, iz, boxes, out):
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    if mode == "madd":
        oix = ox[:] * ix[:]
        oiy = oy[:] * iy[:]
        oiz = oz[:] * iz[:]

        def bound(row, k, o, inv):
            return boxes[row, k] * inv[:] - (oix if inv is ix else
                                             oiy if inv is iy else oiz)
    else:
        def bound(row, k, o, inv):
            return (boxes[row, k] - o[:]) * inv[:]

    def rep_body(r, acc):
        return jax.lax.fori_loop(
            0, NBOX, lambda i, a: box_body(jax.lax.rem(i + r, NBOX), a),
            acc)

    def box_body(k, acc):
        t0x = bound(0, k, ox, ix)
        t1x = bound(3, k, ox, ix)
        t0y = bound(1, k, oy, iy)
        t1y = bound(4, k, oy, iy)
        t0z = bound(2, k, oz, iz)
        t1z = bound(5, k, oz, iz)
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


@functools.partial(jax.jit, static_argnames=("mode",))
def run(rays, boxes, mode):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, mode),
        # box bounds ride in SMEM (dynamic scalar loads), matching the
        # real kernel's scalar-prefetch node arrays
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
    )(*rays, boxes)
    return jnp.sum(out)


def main():
    rng = np.random.default_rng(0)
    rays = tuple(
        jnp.asarray(rng.uniform(0.5, 2.0, (RAYROWS, LANES)), jnp.float32)
        for _ in range(6))
    boxes = jnp.asarray(rng.uniform(-4.0, 4.0, (8, NBOX)), jnp.float32)
    for mode in ("sub", "madd"):
        float(run(rays, boxes, mode))  # compile
    meds = {}
    samples = {"sub": [], "madd": []}
    for _ in range(7):
        for mode in ("sub", "madd"):  # interleaved A/B
            t0 = time.time()
            float(run(rays, boxes, mode))
            samples[mode].append(time.time() - t0)
    for mode, ts in samples.items():
        ts.sort()
        meds[mode] = ts[len(ts) // 2]
        print(f"{mode}: median {meds[mode]*1e3:.1f} ms")
    print(f"madd speedup: {meds['sub']/meds['madd']:.3f}x")


if __name__ == "__main__":
    main()

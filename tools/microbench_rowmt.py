#!/usr/bin/env python
"""Probe: per-row Möller–Trumbore operand cost.

The per-row leaf-drain redesign (BENCHMARKS.md chunk-demand table) gives
each sublane row its OWN leaf chunk, so triangle operands become (8,1)
per-row columns of a VMEM (PLANES, 8, CHUNK) buffer instead of SMEM
scalars broadcast to the whole packet. This probe measures the MT slot
loop in both forms (and validates Mosaic accepts the strided (8,1)
extracts at all) so the redesign's per-slot overhead is known before the
kernel surgery:

  smem:  12 scalar SMEM loads / slot, operands broadcast (8,128)
  vmem:  12 static-column (8,1) VMEM extracts / slot

Same MT math; measurement rules per BENCHMARKS.md (scalar fetch,
interleaved medians, >100ms probes).
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

ROWS = 8
LANES = 128
PLANES = 12
CHUNK = 256
REPS = 256
SLOTS = 64   # MT slots tested per rep


def _kernel(mode, ox, oy, oz, dx, dy, dz, tri_smem, tri_vmem, out):
    def mt(loads):
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, _p9, tri_id,
         valid) = loads
        pvx = dy[:] * e2z - dz[:] * e2y
        pvy = dz[:] * e2x - dx[:] * e2z
        pvz = dx[:] * e2y - dy[:] * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
        tvx = ox[:] - v0x
        tvy = oy[:] - v0y
        tvz = oz[:] - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx[:] * qvx + dy[:] * qvy + dz[:] * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        take = ((jnp.abs(det) >= 1e-8)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= 1e-3) & (valid > 0.5))
        return jnp.where(take, t + tri_id, 0.0)

    def rep_body(r, acc):
        if mode == "smem":
            def slot_body(s, a):
                j = jax.lax.rem(8 * r + s, CHUNK)
                loads = tuple(tri_smem[p, j] for p in range(PLANES))
                return a + mt(loads)

            # static 8-slot unroll like the production drain
            for s in range(8):
                acc = slot_body(jnp.int32(s), acc)
            return acc
        # vmem-tile mode: load each plane's first (8,128) tile ONCE per
        # 8-slot run (hoisted by Mosaic), extract static (8,1) columns
        # per slot at the register level
        tiles = [tri_vmem[p, :, pl.ds(0, 128)] for p in range(PLANES)]

        def slot_body_v(s, a):
            # fully STATIC column slice of a register value (the real
            # drain's slot index is a python int in the unrolled loop)
            loads = tuple(tiles[p][:, s:s + 1] for p in range(PLANES))
            return a + mt(loads)

        for s in range(8):
            acc = slot_body_v(s, acc)
        return acc

    acc = jax.lax.fori_loop(0, REPS * SLOTS // 8, rep_body,
                            jnp.zeros((ROWS, LANES), jnp.float32))
    out[:] = acc


@functools.partial(jax.jit, static_argnames=("mode",))
def run(rays, tri_smem, tri_vmem, mode):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, mode),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pltpu.SMEM),
                               pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(*rays, tri_smem, tri_vmem)
    return jnp.sum(out)


def main():
    from metal_pathtracer_tpu.utils.compilecache import enable_cache

    enable_cache()
    rng = np.random.default_rng(0)
    rays = tuple(
        jnp.asarray(rng.uniform(-1.0, 1.0, (ROWS, LANES)), jnp.float32)
        for _ in range(6))
    tri = rng.uniform(-2.0, 2.0, (PLANES, CHUNK)).astype(np.float32)
    tri_smem = jnp.asarray(tri)
    tri_vmem = jnp.asarray(
        np.broadcast_to(tri[:, None, :], (PLANES, ROWS, CHUNK)).copy())
    modes = ("smem", "vmem")
    for mode in modes:
        print(f"{mode}: {float(run(rays, tri_smem, tri_vmem, mode)):.3f}",
              flush=True)
    samples = {m: [] for m in modes}
    for _ in range(7):
        for mode in modes:
            t0 = time.time()
            float(run(rays, tri_smem, tri_vmem, mode))
            samples[mode].append(time.time() - t0)
    meds = {}
    n_slots = REPS * SLOTS
    for mode, ts in samples.items():
        ts.sort()
        meds[mode] = ts[len(ts) // 2]
        print(f"{mode}: median {meds[mode]*1e3:.1f} ms "
              f"({meds[mode]/n_slots*1e9:.1f} ns/slot)")
    print(f"vmem/smem: {meds['vmem']/meds['smem']:.3f}x")


if __name__ == "__main__":
    main()

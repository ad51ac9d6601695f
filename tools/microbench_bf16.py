#!/usr/bin/env python
"""Decide BENCHMARKS.md round-4 plan #1: do packed bf16 elementwise ops
run ~2x f32 on the v5e VPU, or does Mosaic upcast them?

Times K chained slab-shaped op bodies (sub, mul, min/max chain — the
exact shape of traverse.py's slab_margin) on (ROWS,128) tiles in f32 vs
bf16 inside one kernel launch, fetching only a reduced scalar
(tpu-axon-measurement-rules: never fetch full arrays; probes must be
>100ms)."""

import functools
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


if __name__ == "__main__":
    main()

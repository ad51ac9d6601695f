#!/usr/bin/env python
"""Empirical VPU f32 elementwise-op peak for the roofline (BENCHMARKS.md
round-5 budget section).

The earlier microbench_bf16 part 1 chained ops on ONE accumulator — a
serial dependent chain that measures op LATENCY (and sat near the
dispatch floor). This one measures THROUGHPUT: 8 independent
accumulator chains over (8,128)-native tiles inside a fori_loop sized
to ~0.5 s, so the VPU pipeline stays full and the ~40 ms dispatch floor
is <10% and subtracted anyway.

Op mix is slab-shaped (sub/mul/min/max — exactly traverse.py's
slab_margin_rows mix), counted exactly; prints T elem-ops/s.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8          # one native (8,128) vreg tile per accumulator
LANES = 128
CHAINS = 8        # independent chains to fill the ALU pipeline
UNROLL = 16       # unrolled bodies per fori trip (amortize trip overhead)
K = 4_000_000     # fori_loop trip count; 4 ops/chain/unroll-step
OPS_PER_ITER = CHAINS * 4 * UNROLL


def _kernel(a_ref, o_ref):
    b = a_ref[:]

    def body(_, accs):
        for _u in range(UNROLL):
            out = []
            for acc in accs:
                t = (acc - b) * jnp.float32(1.0000001)
                acc = jnp.maximum(jnp.minimum(t, acc), b)
                out.append(acc)
            accs = tuple(out)
        return accs

    accs = tuple(a_ref[:] + jnp.float32(i) for i in range(CHAINS))
    accs = jax.lax.fori_loop(0, K, body, accs)
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    o_ref[:] = acc


@jax.jit
def run(a):
    spec = pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(a)
    return jnp.sum(out)


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 2.0, (ROWS, LANES)), jnp.float32)
    float(run(a))  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(run(a))
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    elems = ROWS * LANES
    total_ops = K * OPS_PER_ITER * elems
    # subtract the measured jit dispatch floor (~40 ms on the axon tunnel)
    for label, t in (("raw", med), ("floor-corrected", med - 0.04)):
        print(f"{label}: {t*1e3:.1f} ms  "
              f"{total_ops/t/1e12:.2f} T f32 elem-ops/s")


if __name__ == "__main__":
    main()

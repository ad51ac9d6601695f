#!/usr/bin/env python
"""Amortized gather/scatter/sort costs: K reps inside ONE jit (the axon
tunnel costs ~40ms per dispatch, so single-op timings are floor-dominated).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, k=16, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        times.append(time.time() - t0)
    best = (min(times) - 0.040) / k  # subtract tunnel floor, per-op
    print(f"{name:48s} {best*1e3:9.2f} ms/op", flush=True)
    return best


def chain(op, k=16):
    def fn(x, p):
        def body(i, x):
            return op(x, p) + 0.0  # keep data dependence
        return jax.lax.fori_loop(0, k, body, x)
    return jax.jit(fn)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    for N in (1 << 16, 1 << 21):
        perm = jnp.asarray(rng.permutation(N).astype(np.int32))
        for W in (1, 8):
            shape = (N,) if W == 1 else (N, W)
            d = jnp.asarray(rng.random(shape, dtype=np.float32))
            timeit(f"take N={N} W={W} chained", chain(lambda x, p: x[p]), d, perm)
        d1 = jnp.asarray(rng.random((N,), dtype=np.float32))
        timeit(f"scatter-add N={N} chained",
               chain(lambda x, p: jnp.zeros_like(x).at[p].add(x)), d1, perm)

    # argsort chained (data-dependent keys each round)
    N = 1 << 21
    keys = jnp.asarray(rng.integers(0, 1281, N, dtype=np.int32))

    def sort_chain(k0, _):
        def body(i, k):
            p = jnp.argsort(k)
            return (k + p) % 1281
        return jax.lax.fori_loop(0, 4, body, k0)
    timeit("argsort N=2M chained", jax.jit(sort_chain), keys, keys, k=4)


if __name__ == "__main__":
    main()

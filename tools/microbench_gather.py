#!/usr/bin/env python
"""Gather/scatter scaling on the real chip: size x width x index pattern."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name:52s} {best*1e3:9.2f} ms")
    return best


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    take = jax.jit(lambda d, p: d[p])
    for N in (1 << 16, 1 << 18, 1 << 21):
        perm_rand = jnp.asarray(rng.permutation(N).astype(np.int32))
        # blocky: a permutation of 1024-element blocks (tile-level reorder)
        blocks = rng.permutation(N // 1024)
        perm_block = jnp.asarray(
            (blocks[:, None] * 1024 + np.arange(1024)[None, :])
            .reshape(-1).astype(np.int32))
        for W in (1, 8, 24):
            d = jnp.asarray(rng.random((N, W), dtype=np.float32).squeeze())
            timeit(f"take N={N} W={W} random", take, d, perm_rand)
            timeit(f"take N={N} W={W} blocky1024", take, d, perm_block)
        scat = jax.jit(lambda d, p: jnp.zeros_like(d).at[p].set(d))
        d1 = jnp.asarray(rng.random((N,), dtype=np.float32))
        timeit(f"scatter-set N={N} W=1 random", scat, d1, perm_rand)


if __name__ == "__main__":
    main()

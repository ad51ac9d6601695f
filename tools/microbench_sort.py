#!/usr/bin/env python
"""Microbenchmarks for the chunk-binning trace pipeline primitives.

Run on the real TPU chip. Measures, inside single jits with forced host
fetches (BENCHMARKS.md rule: eager dispatch ~40ms/op over the tunnel):
  1. jnp.argsort / jax.lax.sort of M uint32 keys
  2. sort_key_val of (keys, values)
  3. scatter-add histogram over C bins
  4. take (gather) of M rows from an (M,) permutation
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # force fetch
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name:45s} {best*1e3:9.2f} ms")
    return best


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    for M in (1 << 21, 1 << 23):
        keys = jnp.asarray(rng.integers(0, 1281, M, dtype=np.uint32))
        vals = jnp.asarray(np.arange(M, dtype=np.uint32))

        argsort = jax.jit(lambda k: jnp.argsort(k))
        timeit(f"argsort M={M}", argsort, keys)

        sortkv = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        timeit(f"sort_key_val M={M}", sortkv, keys, vals)

        hist = jax.jit(lambda k: jnp.zeros(1281, jnp.int32).at[k].add(1))
        timeit(f"scatter-add histogram M={M} C=1281", hist, keys)

        perm = jnp.asarray(rng.permutation(M).astype(np.int32))
        data = jnp.asarray(rng.random((M,), dtype=np.float32))
        take1 = jax.jit(lambda d, p: d[p])
        timeit(f"take (M,) by perm M={M}", take1, data, perm)

        data4 = jnp.asarray(rng.random((M, 4), dtype=np.float32))
        take4 = jax.jit(lambda d, p: d[p])
        timeit(f"take (M,4) rows by perm M={M}", take4, data4, perm)

        # blocked counting rank: per-block histogram + scan (the usable
        # form per BENCHMARKS.md); B blocks of 2048 keys
        def counting_rank(k):
            C = 1281
            BLK = 2048
            kb = k.reshape(-1, BLK)
            onehot = (kb[..., None] == jnp.arange(C, dtype=jnp.uint32)
                      ).astype(jnp.int32)  # (B, BLK, C)
            within = jnp.cumsum(onehot, axis=1) - onehot  # exclusive
            per_block = onehot.sum(1)  # (B, C)
            block_off = jnp.cumsum(per_block, 0) - per_block  # (B, C)
            base = jnp.cumsum(per_block.sum(0)) - per_block.sum(0)  # (C,)
            rank = (base[kb] + jnp.take_along_axis(
                block_off, kb.astype(jnp.int32), 1)
                + jnp.take_along_axis(
                    within, kb[..., None].astype(jnp.int32), 2)[..., 0])
            return rank.reshape(-1)

        if M <= 1 << 21:
            timeit(f"blocked counting-rank M={M} C=1281",
                   jax.jit(counting_rank), keys)


if __name__ == "__main__":
    main()

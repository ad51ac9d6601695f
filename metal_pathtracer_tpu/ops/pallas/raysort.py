"""Wavefront ray sorting: direction octant + origin Morton cell.

The stream-reordering half of a wavefront architecture (BASELINE.md's
"stream compaction" north star; the reference's megakernel has no
analogue — GPU threads tolerate divergence, TPU packets do not). Bounce
wavefronts in pixel order put rays with wildly different headings in one
packet, so every packet traverses the union of their BVH footprints.
Sorting by a (direction octant, quantized origin) key regroups rays into
tight packets; measured 2.2x on a synthetic worst-case bounce load for
the packet traversal kernel (and sign-pure packets as a bonus).

The sort is a 2-pass LSD radix (6-bit digits) built from blocked counting
ranks: jnp.argsort costs ~276 ms on 2M keys on this backend, while the
blocked form is a few fused memory passes (the flat cumsum alternative
lowers to a pathological 2M-long scan — measured 28 s in culltrace.py's
first version).
"""

from __future__ import annotations

import jax.numpy as jnp

_BLK = 4096


def _counting_pass(digit, n_buckets):
    """Stable rank of each element under `digit` (blocked counting sort)."""
    n = digit.shape[0]
    nb = (n + _BLK - 1) // _BLK
    d = jnp.pad(digit, (0, nb * _BLK - n),
                constant_values=n_buckets).reshape(nb, _BLK)
    onehot = d[:, :, None] == jnp.arange(n_buckets + 1)[None, None, :]
    local = jnp.cumsum(onehot, axis=1) - 1                 # in-block rank
    counts = jnp.sum(onehot, axis=1)                       # (nb, B+1)
    block_base = jnp.cumsum(counts, axis=0) - counts       # exclusive scan
    totals = jnp.sum(counts, axis=0)
    bucket_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1].astype(jnp.int32)])
    pos = (bucket_base[None, None, :] + block_base[:, None, :] + local)
    pos = jnp.take_along_axis(pos, d[:, :, None], axis=2)[:, :, 0]
    return pos.reshape(-1)[:n].astype(jnp.int32)


def _radix_argsort(key, total_bits=12, bits_per_pass=6):
    """Stable LSD radix argsort for small non-negative integer keys."""
    n = key.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    k = key
    for shift in range(0, total_bits, bits_per_pass):
        digit = (k >> shift) & ((1 << bits_per_pass) - 1)
        pos = _counting_pass(digit, 1 << bits_per_pass)
        inv = jnp.zeros((n,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32))
        perm = perm[inv]
        k = k[inv]
    return perm


def ray_sort_key(origin, direction, scene_min, scene_inv_extent, dead=None):
    """12-bit key: 3-bit direction octant (major) + 9-bit origin Morton.

    Dead rays (tmax collapsed to 0 by the integrator's alive masking or
    shadow gating) get the terminal bucket: they compact into all-dead
    packets whose traversal stack drains after the root pop — free
    wavefront compaction riding the same sort.
    """
    octant = ((direction[:, 0] < 0).astype(jnp.int32)
              + 2 * (direction[:, 1] < 0).astype(jnp.int32)
              + 4 * (direction[:, 2] < 0).astype(jnp.int32))
    q = jnp.clip(((origin - scene_min) * scene_inv_extent * 8.0)
                 .astype(jnp.int32), 0, 7)
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    morton = jnp.zeros_like(x)
    for b in range(3):
        morton = (morton
                  | (((x >> b) & 1) << (3 * b))
                  | (((y >> b) & 1) << (3 * b + 1))
                  | (((z >> b) & 1) << (3 * b + 2)))
    key = octant * 512 + morton
    if dead is not None:
        key = jnp.where(dead, 4095, key)
    return key


def sort_octant_in_tile(direction, dead, tile_size=1024):
    """Tile-major key: rays stay in their (coherent) tile; within a tile
    they group by direction octant; dead rays compact to the very end.
    The middle ground between no re-keying (bounce packets mix headings)
    and global spatial re-keying (destroys tile locality — measured WORSE
    end-to-end)."""
    n = direction.shape[0]
    octant = ((direction[:, 0] < 0).astype(jnp.int32)
              + 2 * (direction[:, 1] < 0).astype(jnp.int32)
              + 4 * (direction[:, 2] < 0).astype(jnp.int32))
    tile = (jnp.arange(n, dtype=jnp.int32) // tile_size)
    n_tiles = (n + tile_size - 1) // tile_size
    key = jnp.where(dead, n_tiles * 8, tile * 8 + octant)
    bits = max(int(n_tiles * 8 + 1).bit_length(), 6)
    perm = _radix_argsort(key, total_bits=bits)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


def partition_dead(dead):
    """Stable alive-first partition (1-bit counting sort): compacts dead
    lanes into drained packets while preserving the wavefront's tile
    coherence exactly — no spatial re-keying."""
    pos = _counting_pass(dead.astype(jnp.int32), 2)
    n = dead.shape[0]
    perm = jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, pos


def sort_rays(origin, direction, scene_min, scene_inv_extent, dead=None):
    """-> (perm, inv): trace rays in perm order, scatter results via inv."""
    key = ray_sort_key(origin, direction, scene_min, scene_inv_extent, dead)
    perm = _radix_argsort(key)
    n = origin.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv

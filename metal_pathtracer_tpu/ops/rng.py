"""Counter-free PCG hash RNG, bit-compatible with the reference.

The reference advances one uint32 state per GPU thread through a PCG output
hash (reference: shaders/pathtrace.metal:55-64) seeded per pixel/sample by

    seed = fixedRngSeed + frameIndex*9781 + x*6271 + y*13007
           + (sampleCount + previousCount)*211

(reference: pathtrace.metal:9735-9740). We keep the exact same recipe —
seeding by absolute pixel/sample id is what makes images independent of
device-mesh sharding (SURVEY.md §5.8).

State is a uint32 array over the wavefront; every draw returns
(new_state, value). Rejection loops (unit disk/sphere) advance state only on
not-yet-accepted lanes, matching the reference's data-dependent draw counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
_INV_2_32 = jnp.float32(1.0 / 4294967296.0)


def pcg_hash(state):
    """One PCG-XSH-RR style output step (reference: pathtrace.metal:55-59)."""
    state = state.astype(U32) * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> U32(28)) + U32(4))) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def rand_uniform(state):
    """Advance state, return uniform in [0,1) (reference: pathtrace.metal:61-64)."""
    state = pcg_hash(state)
    return state, state.astype(jnp.float32) * _INV_2_32


def make_seed(fixed_seed, frame_index, x, y, sample_count, previous_count):
    """The reference's per-pixel seed recipe (pathtrace.metal:9735-9740)."""
    fixed_seed = jnp.asarray(fixed_seed, U32)
    frame_index = jnp.asarray(frame_index, U32)
    return (fixed_seed
            + frame_index * U32(9781)
            + x.astype(U32) * U32(6271)
            + y.astype(U32) * U32(13007)
            + (jnp.asarray(sample_count, U32) + previous_count.astype(U32)) * U32(211))


def _masked_rejection(state, draw_fn, accept_fn, n_dims, max_iters=24):
    """Vectorized rejection sampling that only advances rejected lanes.

    Lanes that have accepted keep their state and value; others redraw.
    max_iters bounds the loop (acceptance ~0.52/0.79 per try => miss
    probability < 1e-7 at 24 iters even for the unit sphere); stragglers
    keep their last candidate, which is measure-zero in practice.
    """
    shape = state.shape

    def body(_, carry):
        st, accepted, value = carry
        new_st, cand = draw_fn(st)
        inside = accept_fn(cand)
        take = jnp.logical_and(jnp.logical_not(accepted), inside)
        # Always keep the newest candidate on still-rejected lanes so the
        # final fallback is the last draw.
        keep_old = accepted
        value = jnp.where(keep_old[..., None], value, cand)
        st = jnp.where(keep_old, st, new_st)
        accepted = jnp.logical_or(accepted, inside)
        return st, accepted, value

    accepted0 = jnp.zeros(shape, bool)
    value0 = jnp.zeros(shape + (n_dims,), jnp.float32)
    state, _, value = jax.lax.fori_loop(0, max_iters, body, (state, accepted0, value0))
    return state, value


def random_in_unit_disk(state):
    """(reference: pathtrace.metal:79-86) — rejection in the unit disk."""

    def draw(st):
        st, r1 = rand_uniform(st)
        st, r2 = rand_uniform(st)
        return st, jnp.stack([r1, r2], axis=-1) * 2.0 - 1.0

    def accept(p):
        return jnp.sum(p * p, axis=-1) < 1.0

    return _masked_rejection(state, draw, accept, 2)


def random_in_unit_sphere(state):
    """(reference: pathtrace.metal:66-73) — rejection in the unit ball."""

    def draw(st):
        st, r1 = rand_uniform(st)
        st, r2 = rand_uniform(st)
        st, r3 = rand_uniform(st)
        return st, jnp.stack([r1, r2, r3], axis=-1) * 2.0 - 1.0

    def accept(p):
        return jnp.sum(p * p, axis=-1) < 1.0

    return _masked_rejection(state, draw, accept, 3)


def random_unit_vector(state):
    state, p = random_in_unit_sphere(state)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(p * p, axis=-1, keepdims=True), 1e-20))
    return state, p / norm


def sample_cosine_hemisphere(state):
    """Cosine-weighted hemisphere in local (tangent) space
    (reference: pathtrace.metal sample_cosine_hemisphere)."""
    state, r1 = rand_uniform(state)
    state, r2 = rand_uniform(state)
    phi = 2.0 * jnp.pi * r2
    r = jnp.sqrt(jnp.maximum(r1, 0.0))
    x = jnp.cos(phi) * r
    y = jnp.sin(phi) * r
    z = jnp.sqrt(jnp.maximum(1.0 - r1, 0.0))
    return state, jnp.stack([x, y, z], axis=-1)

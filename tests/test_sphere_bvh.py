"""Chunked sphere-culling kernel (the sphere-BVH analogue) vs the brute
kernel, both under the Pallas interpreter so the CPU suite covers them.

The chunked path (ops/pallas/primitives.py `_sphere_kernel_chunked`,
reference: BvhBuilder.mm:26-166 sphere BVH) must be a pure acceleration:
identical hits to the brute per-sphere loop. tests/tpu re-runs the
parity compiled on hardware via the 100-sphere kernel test.
"""

import numpy as np
import pytest


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setenv("MPT_PALLAS_INTERPRET", "1")


def _rays(rng, n):
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_chunked_matches_brute(interpret_mode, monkeypatch):
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas import primitives as pk

    rng = np.random.default_rng(7)
    S = 100  # > 2*SPHERE_GROUP -> chunked path
    centers = jnp.asarray(rng.uniform(-5, 5, (S, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0.1, 0.5, S).astype(np.float32))
    o, d = _rays(rng, 1500)

    monkeypatch.setenv("MPT_SPHERE_BVH", "0")
    t_ref, i_ref = pk.sphere_nearest(jnp.asarray(o), jnp.asarray(d),
                                     1e-3, 1e20, centers, radii)
    monkeypatch.setenv("MPT_SPHERE_BVH", "1")
    t_got, i_got = pk.sphere_nearest(jnp.asarray(o), jnp.asarray(d),
                                     1e-3, 1e20, centers, radii)

    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_got))
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_got))


def test_chunked_culls(interpret_mode):
    """Rays aimed at one far cluster must still hit it exactly (culling is
    conservative), including spheres entered from inside (t_far root)."""
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas import primitives as pk

    rng = np.random.default_rng(11)
    # two clusters far apart + one ray origin inside a sphere
    c1 = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    c2 = rng.uniform(99, 101, (40, 3)).astype(np.float32)
    centers = jnp.asarray(np.concatenate([c1, c2]))
    radii = jnp.asarray(np.full(80, 0.3, np.float32))

    n = 600
    o = np.zeros((n, 3), np.float32)
    o[:] = c1[0]  # inside sphere 0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t, i = pk.sphere_nearest(jnp.asarray(o), jnp.asarray(d),
                             1e-3, 1e20, centers, radii)
    i = np.asarray(i)
    t = np.asarray(t)
    assert (i >= 0).all()  # every ray starts inside sphere 0
    # brute-force numpy oracle for the nearest hit
    oc = o[:, None, :] - np.asarray(centers)[None]
    half_b = np.sum(oc * d[:, None, :], -1)
    c = np.sum(oc * oc, -1) - np.asarray(radii)[None] ** 2
    disc = half_b**2 - c
    sq = np.sqrt(np.maximum(disc, 0.0))
    t_near = np.where((-half_b - sq) >= 1e-3, -half_b - sq, np.inf)
    t_far = np.where((-half_b + sq) >= 1e-3, -half_b + sq, np.inf)
    t_all = np.where(disc >= 0, np.minimum(t_near, t_far), np.inf)
    i_exp = np.argmin(t_all, axis=1)
    np.testing.assert_array_equal(i, i_exp)
    np.testing.assert_allclose(t, np.min(t_all, axis=1), rtol=1e-4)


def test_small_scene_stays_brute(interpret_mode, monkeypatch):
    """<= 2 chunks of spheres keeps the brute kernel (no cull overhead)."""
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas import primitives as pk

    calls = []
    orig = pk._sphere_call

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pk, "_sphere_call", spy)
    rng = np.random.default_rng(3)
    centers = jnp.asarray(rng.uniform(-2, 2, (16, 3)).astype(np.float32))
    radii = jnp.asarray(np.full(16, 0.4, np.float32))
    o, d = _rays(rng, 300)
    pk.sphere_nearest(jnp.asarray(o), jnp.asarray(d), 1e-3, 1e20,
                      centers, radii)
    assert calls  # brute path used

"""TPU-only kernel parity tests (run manually: `python -m pytest
tests/tpu/ -q` on a TPU host; the CPU CI conftest forces jax-CPU where
these skip).

Validates the Pallas kernels bit-for-bit against the jnp reference
implementations on real hardware.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from metal_pathtracer_tpu.utils.compilecache import enable_cache  # noqa: E402

enable_cache()


def _tpu():
    import jax
    return jax.devices()[0].platform in ("tpu", "axon")


pytestmark = pytest.mark.skipif(
    os.environ.get("JAX_PLATFORMS", "") == "cpu" or not _tpu(),
    reason="TPU-only kernel tests")


def test_sphere_kernel_matches_jnp():
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops import intersect
    from metal_pathtracer_tpu.schema import SpheresSoA

    rng = np.random.default_rng(0)
    S = 100
    spheres = SpheresSoA(
        center=jnp.asarray(rng.uniform(-5, 5, (S, 3)).astype(np.float32)),
        radius=jnp.asarray(np.full(S, 0.4, np.float32)),
        material=jnp.zeros(S, jnp.int32))
    N = 4096
    o = rng.uniform(-6, 6, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    os.environ["MPT_DISABLE_PALLAS"] = "1"
    ref = intersect.hit_spheres(jnp.asarray(o), jnp.asarray(d), spheres,
                                1e-3, 1e20)
    del os.environ["MPT_DISABLE_PALLAS"]
    got = intersect.hit_spheres(jnp.asarray(o), jnp.asarray(d), spheres,
                                1e-3, 1e20)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(ref.prim_index)[h],
                                  np.asarray(got.prim_index)[h])
    np.testing.assert_allclose(np.asarray(ref.t)[h], np.asarray(got.t)[h],
                               rtol=1e-4)


def test_packet_traversal_matches_brute_force():
    import jax.numpy as jnp
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh
    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace
    from metal_pathtracer_tpu.utils.procgen import dragon_class_mesh

    pos, _, faces = dragon_class_mesh(4)
    v0, v1, v2 = pos[faces[:, 0]], pos[faces[:, 1]], pos[faces[:, 2]]
    bvh = build_packet_bvh(v0, v1, v2)

    rng = np.random.default_rng(2)
    N = 2048
    o = np.tile(np.array([0, 0, 4.0], np.float32), (N, 1))
    tg = rng.normal(scale=0.5, size=(N, 3)).astype(np.float32)
    d = tg - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t, tri, u, v = packet_trace(jnp.asarray(o), jnp.asarray(d), 1e-3, 1e20, bvh)

    e1 = v1 - v0
    e2 = v2 - v0
    pv = np.cross(d[:, None, :], e2[None])
    det = (e1[None] * pv).sum(-1)
    inv = np.where(np.abs(det) < 1e-8, np.nan, 1.0 / det)
    tv = o[:, None, :] - v0[None]
    uu = (tv * pv).sum(-1) * inv
    qv = np.cross(tv, e1[None])
    vv = (d[:, None, :] * qv).sum(-1) * inv
    tt = (e2[None] * qv).sum(-1) * inv
    ok = (np.abs(det) >= 1e-8) & (uu >= 0) & (uu <= 1) & (vv >= 0) \
        & (uu + vv <= 1) & (tt >= 1e-3)
    tt = np.where(ok, tt, np.inf)
    want_t = tt.min(1)
    want_tri = np.where(np.isfinite(want_t), tt.argmin(1), -1)

    got_tri = np.asarray(tri)
    hit = np.isfinite(want_t)
    np.testing.assert_array_equal(got_tri >= 0, hit)
    np.testing.assert_allclose(np.asarray(t)[hit], want_t[hit], rtol=1e-3)
    agree = (got_tri[hit] == want_tri[hit]).mean()
    assert agree > 0.99  # exact ties may pick either triangle


def test_packet_exclusion():
    import jax.numpy as jnp
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh
    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace

    v0 = np.array([[0, 0, 1], [0, 0, 2]], np.float32)
    v1 = np.array([[4, 0, 1], [4, 0, 2]], np.float32)
    v2 = np.array([[0, 4, 1], [0, 4, 2]], np.float32)
    bvh = build_packet_bvh(v0, v1, v2)
    o = jnp.asarray([[1.0, 1.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    _, tri, _, _ = packet_trace(o, d, 1e-3, 1e20, bvh)
    assert int(np.asarray(tri)[0]) == 0
    _, tri2, _, _ = packet_trace(o, d, 1e-3, 1e20, bvh,
                                 exclude_prim=jnp.asarray([0], jnp.int32))
    assert int(np.asarray(tri2)[0]) == 1


if __name__ == "__main__":
    # Standalone TPU run (pytest discovery inherits the CPU conftest, which
    # skips these): `python tests/tpu/test_tpu_kernels.py`
    test_sphere_kernel_matches_jnp()
    print("sphere kernel: OK")
    test_packet_traversal_matches_brute_force()
    print("packet traversal: OK")
    test_packet_exclusion()
    print("packet exclusion: OK")


def test_culltrace_matches_packet_trace():
    """Experimental culltrace path: exact hit parity with the v1 kernel
    (random soup incl. excluded prims and grazing rays)."""
    import jax.numpy as jnp
    import importlib.util as _ilu
    import os as _os
    _ct_path = _os.path.join(_os.path.dirname(__file__), "..", "..",
                             "tools", "culltrace.py")
    _spec = _ilu.spec_from_file_location("culltrace", _ct_path)
    _ct = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_ct)
    cull_trace = _ct.cull_trace
    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh

    rng = np.random.default_rng(3)
    T = 5000
    v0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.4, 0.4, (T, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.4, 0.4, (T, 3)).astype(np.float32)
    bvh = build_packet_bvh(v0, v1, v2)

    N = 4096
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    excl = np.where(rng.random(N) < 0.2,
                    rng.integers(0, T, N), -1).astype(np.float32)
    oj, dj, ej = jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl)
    t0, tri0, u0, v0r = packet_trace(oj, dj, 1e-3, 3e38, bvh, ej)
    t1, tri1, u1, v1r = cull_trace(oj, dj, 1e-3, 3e38, bvh, ej)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                               rtol=1e-5, atol=1e-5)
    hit = np.asarray(tri0) >= 0
    np.testing.assert_allclose(np.asarray(u0)[hit], np.asarray(u1)[hit],
                               atol=1e-5)


def test_anyhit_matches_nearest_occlusion():
    """any_hit shadow mode: identical occlusion boolean to nearest-hit,
    including per-ray tmax-gated (dead) lanes."""
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh

    rng = np.random.default_rng(5)
    T = 8000
    v0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.4, 0.4, (T, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.4, 0.4, (T, 3)).astype(np.float32)
    bvh = build_packet_bvh(v0, v1, v2)
    N = 8192
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    tmax = np.where(rng.random(N) < 0.3, 0.0, 3e38).astype(np.float32)
    oj, dj, tj = (np.asarray(x) for x in (o, d, tmax))
    import jax.numpy as jnp
    oj, dj, tj = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax)
    _, tri_n, _, _ = packet_trace(oj, dj, 1e-3, tj, bvh, None)
    _, tri_a, _, _ = packet_trace(oj, dj, 1e-3, tj, bvh, None, any_hit=True)
    np.testing.assert_array_equal(np.asarray(tri_n) >= 0,
                                  np.asarray(tri_a) >= 0)


def test_traversal_stats_counters():
    """Per-packet nodesVisited / leafChunks counters (the reference's
    PathtraceStats analogues, SURVEY.md §5.1)."""
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace_unsorted
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh

    rng = np.random.default_rng(9)
    T = 6000
    v0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.4, 0.4, (T, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.4, 0.4, (T, 3)).astype(np.float32)
    bvh = build_packet_bvh(v0, v1, v2)
    N = 2048
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t, tri, u, v, stats = packet_trace_unsorted(
        oj, dj, 1e-3, 3e38, bvh, None, return_stats=True)
    nodes = float(np.asarray(stats["nodes_visited"]))
    leaves = float(np.asarray(stats["leaf_chunks_tested"]))
    assert nodes > 0 and leaves > 0
    # wide tree: each popped super-node can queue up to 8 leaf chunks
    assert leaves <= 8 * nodes
    # results identical to the plain call
    t2, tri2, _, _ = packet_trace_unsorted(oj, dj, 1e-3, 3e38, bvh, None)
    np.testing.assert_array_equal(np.asarray(tri), np.asarray(tri2))


def test_wide_kernel_matches_narrow():
    """8-wide collapsed-tree kernel vs the binary-tree kernel: per-ray
    results must be bit-identical (same chunk leaves, same MT math; only
    the traversal schedule differs)."""
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas import traverse
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh

    rng = np.random.default_rng(5)
    n = 30000
    c = (rng.random((n, 3)) * 4 - 2).astype(np.float32)
    v0 = c
    v1 = (c + rng.random((n, 3)) * 0.2).astype(np.float32)
    v2 = (c + rng.random((n, 3)) * 0.2).astype(np.float32)
    bvh = build_packet_bvh(v0, v1, v2)
    assert bvh.n_wnodes > 1

    N = 4096
    o = (rng.random((N, 3)) * 6 - 3).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    os.environ["MPT_WIDE"] = "0"
    t0, i0, u0, v0_ = traverse.packet_trace_unsorted(o, d, 1e-3, 3.0e38, bvh)
    os.environ["MPT_WIDE"] = "1"
    t1, i1, u1, v1_ = traverse.packet_trace_unsorted(o, d, 1e-3, 3.0e38, bvh)
    del os.environ["MPT_WIDE"]
    assert (np.asarray(i0) >= 0).sum() > 100  # the load actually hits
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    np.testing.assert_array_equal(np.asarray(v0_), np.asarray(v1_))


def test_octant_passes_match_single_pass():
    """Octant-masked multi-pass traversal is an exact schedule change."""
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas import traverse
    from metal_pathtracer_tpu.scene.packetbvh import build_packet_bvh

    rng = np.random.default_rng(6)
    n = 20000
    c = (rng.random((n, 3)) * 4 - 2).astype(np.float32)
    bvh = build_packet_bvh(
        c, (c + rng.random((n, 3)) * 0.2).astype(np.float32),
        (c + rng.random((n, 3)) * 0.2).astype(np.float32))
    N = 2048
    o = (rng.random((N, 3)) * 6 - 3).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    os.environ["MPT_OCTANT_PASSES"] = "0"
    t0, i0, _, _ = traverse.packet_trace_unsorted(o, d, 1e-3, 3.0e38, bvh)
    os.environ["MPT_OCTANT_PASSES"] = "1"
    t1, i1, _, _ = traverse.packet_trace_unsorted(o, d, 1e-3, 3.0e38, bvh)
    del os.environ["MPT_OCTANT_PASSES"]
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_gather_material_exact_on_tpu():
    """The one-hot-matmul material fetch must return table rows EXACTLY:
    default TPU matmul precision rounds operands to bf16 and perturbs
    every parameter ~2^-9 (ADVICE r02 high). Uses awkward f32 values and
    int fields > 256 that bf16 cannot represent."""
    import jax
    import jax.numpy as jnp
    from metal_pathtracer_tpu import constants as C
    from metal_pathtracer_tpu.ops.bsdf import gather_material
    from metal_pathtracer_tpu.scene.resources import Material, SceneResources

    res = SceneResources()
    rng = np.random.default_rng(5)
    M = 9
    for i in range(M):
        res.add_material(Material(
            mat_type=C.MATERIAL_PBR,
            base_color=tuple(rng.uniform(0.01, 1, 3).tolist()),
            roughness=float(rng.uniform(0, 1)), ior=1.0 + 1e-3 * i))
    mats = res.build_materials_soa()
    # poison with values bf16 rounds: odd ints > 256 and near-1 floats
    mats = mats.replace(
        material_flags=jnp.arange(M, dtype=jnp.int32) * 257 + 3,
        roughness=jnp.asarray(
            1.0 + np.arange(M, dtype=np.float32) * (2.0 ** -12)))
    idx = jnp.asarray(rng.integers(0, M, 2048, dtype=np.int32))
    lanes = jax.jit(gather_material)(mats, idx)
    np.testing.assert_array_equal(
        np.asarray(lanes.material_flags),
        np.asarray(mats.material_flags)[np.asarray(idx)])
    np.testing.assert_array_equal(
        np.asarray(lanes.roughness),
        np.asarray(mats.roughness)[np.asarray(idx)])
    np.testing.assert_array_equal(
        np.asarray(lanes.base_color),
        np.asarray(mats.base_color)[np.asarray(idx)])


def test_fused_shade_matches_xla_on_tpu():
    """Compiled fused megakernel vs the XLA integrator on hardware.

    The CPU suite proves interpreter-level equivalence; this catches
    Mosaic lowering differences (fma contraction, transcendental tables)
    — tolerance is tight-but-not-bitwise for that reason."""
    import jax.numpy as jnp  # noqa: F401
    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState
    from metal_pathtracer_tpu.scene.resources import Material, SceneResources
    from metal_pathtracer_tpu.schema import (
        settings_to_static,
        settings_to_uniforms,
    )
    from metal_pathtracer_tpu.settings import RenderSettings
    from metal_pathtracer_tpu.utils.benchscene import (
        _ground_mesh,
        _sphere_mesh,
    )
    from metal_pathtracer_tpu import constants as C
    from metal_pathtracer_tpu.ops.pallas import shade

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 6
    settings.fixedRngSeed = 7
    res = SceneResources()
    m0 = res.add_material(Material(base_color=(0.7, 0.5, 0.4)))
    m1 = res.add_material(Material(mat_type=C.MATERIAL_DIELECTRIC, ior=1.5,
                                   dielectric_sigma_a=(0.2, 0.1, 0.02)))
    m2 = res.add_material(Material(mat_type=C.MATERIAL_METAL,
                                   base_color=(0.9, 0.7, 0.4),
                                   roughness=0.3))
    m3 = res.add_material(Material(mat_type=C.MATERIAL_DIFFUSE_LIGHT,
                                   emission=(6.0, 5.0, 4.0)))
    res.add_mesh(_sphere_mesh(2, (0, 0, 0), 1.0, m1, "glass"))
    res.add_mesh(_sphere_mesh(2, (-2.2, 0, 0), 1.0, m2, "metal"))
    res.add_mesh(_sphere_mesh(1, (0, 2.0, 0), 0.5, m3, "lamp"))
    res.add_mesh(_ground_mesh(m0))
    scene = res.build_arrays()
    w, h = 64, 40
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    assert shade.fused_supported(scene, static)
    uni = settings_to_uniforms(settings, build_camera(settings, w, h), 0, 0)

    def render():
        st = frame.render_samples(scene, uni, RenderState.create(w, h),
                                  static, 2)
        return (np.asarray(st.present())[..., :3],
                float(np.asarray(st.ray_count)))

    import jax
    os.environ["MPT_FUSED_SHADE"] = "0"
    img_ref, rays_ref = render()
    jax.clear_caches()   # env toggle is trace-time
    os.environ["MPT_FUSED_SHADE"] = "1"
    img_fused, rays_fused = render()
    os.environ.pop("MPT_FUSED_SHADE", None)
    jax.clear_caches()
    # identical RNG stream -> identical ray counts even if floats drift
    assert rays_fused == rays_ref
    d = np.abs(img_fused - img_ref)
    assert float(np.sqrt((d * d).mean())) < 2e-3, float(d.max())


def _fused_vs_xla_on_tpu(settings, res, w=64, h=40, spp=2, rmse_tol=2e-3):
    """Compiled fused-vs-XLA comparison harness (hardware)."""
    import jax
    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState
    from metal_pathtracer_tpu.schema import (
        settings_to_static,
        settings_to_uniforms,
    )
    from metal_pathtracer_tpu.ops.pallas import shade

    scene = res.build_arrays()
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    assert shade.fused_supported(scene, static)
    uni = settings_to_uniforms(settings, build_camera(settings, w, h), 0, 0)

    def render():
        st = frame.render_samples(scene, uni, RenderState.create(w, h),
                                  static, spp)
        return (np.asarray(st.present())[..., :3],
                float(np.asarray(st.ray_count)))

    os.environ["MPT_FUSED_SHADE"] = "0"
    img_ref, rays_ref = render()
    jax.clear_caches()
    os.environ["MPT_FUSED_SHADE"] = "1"
    img_fused, rays_fused = render()
    os.environ.pop("MPT_FUSED_SHADE", None)
    jax.clear_caches()
    assert rays_fused == rays_ref
    d = np.abs(img_fused - img_ref)
    assert float(np.sqrt((d * d).mean())) < rmse_tol, float(d.max())


def test_fused_cornell_rect_nee_on_tpu():
    """r03 rect-light NEE coverage, compiled on hardware."""
    from metal_pathtracer_tpu.scene import dsl
    from metal_pathtracer_tpu.scene.resources import SceneResources
    from metal_pathtracer_tpu.settings import RenderSettings

    settings = RenderSettings()
    res = SceneResources()
    dsl.parse_scene(
        "camera target=0,1,0 distance=3.9 yaw=1.5708 pitch=0 vfov=40\n"
        "renderer maxDepth=4 seed=7\n"
        "material type=lambert albedo=0.73,0.73,0.73\n"
        "material type=lambert albedo=0.65,0.05,0.05\n"
        "material type=lambert albedo=0.12,0.45,0.15\n"
        "material type=light emit=15,15,15\n"
        "rectangle x=-1,1 y=0 z=-1,1 normal=1 material=0\n"
        "rectangle x=-1,1 y=2 z=-1,1 normal=-1 material=0\n"
        "rectangle x=-1 y=0,2 z=-1,1 normal=1 material=2\n"
        "rectangle x=1 y=0,2 z=-1,1 normal=-1 material=1\n"
        "rectangle x=-1,1 y=0,2 z=-1 normal=1 material=0\n"
        "rectangle x=-0.4,0.4 y=1.99 z=-0.4,0.4 normal=-1 material=3\n",
        settings, res)
    _fused_vs_xla_on_tpu(settings, res)


def test_fused_sphere_scene_on_tpu():
    """r03 analytic-prim coverage (RTOW class), compiled on hardware —
    also exercises the Morton-chunked sphere kernel end-to-end when the
    scene exceeds the chunking threshold."""
    from metal_pathtracer_tpu import constants as C
    from metal_pathtracer_tpu.scene.resources import (
        Material,
        SceneResources,
        Sphere,
    )
    from metal_pathtracer_tpu.settings import RenderSettings

    rng = np.random.default_rng(3)
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.5, 0.0)
    settings.cameraDistance = 6.0
    settings.cameraPitch = 0.25
    settings.maxDepth = 5
    settings.fixedRngSeed = 99
    res = SceneResources()
    m_g = res.add_material(Material(base_color=(0.5, 0.5, 0.5)))
    m_m = res.add_material(Material(base_color=(0.8, 0.7, 0.4),
                                    mat_type=C.MATERIAL_METAL,
                                    roughness=0.2))
    res.spheres.append(Sphere(center=(0, -100, 0), radius=100.0,
                              material=m_g))
    for i in range(40):  # > 2 chunks -> chunked sphere kernel
        c = rng.uniform(-3, 3, 2)
        res.spheres.append(Sphere(center=(float(c[0]), 0.3, float(c[1])),
                                  radius=0.3,
                                  material=m_m if i % 2 else m_g))
    _fused_vs_xla_on_tpu(settings, res)


def test_fused_instanced_on_tpu():
    """r03 instanced coverage, compiled on hardware."""
    import math

    from metal_pathtracer_tpu.scene.resources import (
        Material,
        Mesh,
        SceneResources,
    )
    from metal_pathtracer_tpu.settings import RenderSettings
    from metal_pathtracer_tpu.utils.benchscene import _ground_mesh
    from metal_pathtracer_tpu.utils.procgen import dragon_class_mesh

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 7.0
    settings.cameraPitch = 0.35
    settings.maxDepth = 4
    settings.fixedRngSeed = 55
    res = SceneResources()
    m0 = res.add_material(Material(base_color=(0.7, 0.4, 0.3)))
    m_g = res.add_material(Material(base_color=(0.5, 0.5, 0.55)))
    pos, normals, faces = dragon_class_mesh(2)
    uv = np.zeros((len(pos), 2), np.float32)
    src = Mesh(name="blob", vertices=pos, normals=normals, uv0=uv,
               uv1=uv.copy(), tangents=np.zeros((len(pos), 4), np.float32),
               indices=faces, material=m0)
    for i, (tx, s, ry) in enumerate([(-2.2, 0.8, 0.3), (0.0, 1.0, 0.0),
                                     (2.3, 1.25, -0.7)]):
        c, sn = math.cos(ry), math.sin(ry)
        m = np.eye(4)
        m[:3, :3] = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]]) * s
        m[:3, 3] = [tx, 0.15 * i, 0.0]
        res.add_mesh_instance(src, m)
    res.add_mesh(_ground_mesh(m_g))
    _fused_vs_xla_on_tpu(settings, res)


def test_sphere_chunked_matches_brute_on_tpu():
    """Morton-chunked sphere culling vs the brute kernel, both COMPILED
    (the CPU suite proves interpreter parity; this catches Mosaic
    lowering drift in the chunked kernel's verdict DMA path)."""
    import jax.numpy as jnp
    from metal_pathtracer_tpu.ops.pallas import primitives as pk

    rng = np.random.default_rng(7)
    S = 120
    centers = jnp.asarray(rng.uniform(-5, 5, (S, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0.1, 0.5, S).astype(np.float32))
    N = 8192
    o = rng.uniform(-6, 6, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    os.environ["MPT_SPHERE_BVH"] = "0"
    t_ref, i_ref = pk.sphere_nearest(jnp.asarray(o), jnp.asarray(d),
                                     1e-3, 1e20, centers, radii)
    t_ref, i_ref = np.asarray(t_ref), np.asarray(i_ref)
    os.environ["MPT_SPHERE_BVH"] = "1"
    try:
        t_got, i_got = pk.sphere_nearest(jnp.asarray(o), jnp.asarray(d),
                                         1e-3, 1e20, centers, radii)
    finally:
        os.environ.pop("MPT_SPHERE_BVH", None)
    np.testing.assert_array_equal(i_ref, np.asarray(i_got))
    np.testing.assert_array_equal(t_ref, np.asarray(t_got))


def test_fused_material_families_on_tpu():
    """r04 material-family coverage (plastic + carpaint + separable SSS)
    compiled on hardware — Mosaic rejects lowerings the interpreter
    accepts (e.g. bool-valued select_n -> i8->i1 trunc, hit live on the
    first carpaint compile), so every new kernel branch needs a compiled
    run."""
    from metal_pathtracer_tpu import constants as C
    from metal_pathtracer_tpu.scene.resources import Material, SceneResources
    from metal_pathtracer_tpu.settings import RenderSettings, SssMode
    from metal_pathtracer_tpu.utils.benchscene import (
        _ground_mesh,
        _sphere_mesh,
    )

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 6.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 4
    settings.fixedRngSeed = 23
    settings.sssMode = SssMode.SEPARABLE
    res = SceneResources()
    m_p = res.add_material(Material(
        mat_type=C.MATERIAL_PLASTIC, base_color=(0.6, 0.1, 0.1),
        coat_roughness=0.2, coat_thickness=0.3, ior=1.5))
    m_cp = res.add_material(Material(
        mat_type=C.MATERIAL_CARPAINT, base_color=(0.1, 0.2, 0.6),
        coat_roughness=0.15, carpaint_base_metallic=0.4,
        carpaint_base_roughness=0.25, carpaint_flake_sample_weight=0.2,
        carpaint_flake_roughness=0.2, carpaint_flake_scale=8.0,
        carpaint_flake_normal_strength=0.5, ior=1.5))
    m_s = res.add_material(Material(
        mat_type=C.MATERIAL_SUBSURFACE, base_color=(0.8, 0.4, 0.2),
        sss_mfp=0.25, sss_g=0.2, sss_method=0, ior=1.4))
    m_g = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    res.add_mesh(_sphere_mesh(2, (-1.8, 0.6, 0), 0.8, m_p, "plastic"))
    res.add_mesh(_sphere_mesh(2, (0.0, 0.6, 0), 0.8, m_cp, "carpaint"))
    res.add_mesh(_sphere_mesh(2, (1.8, 0.6, 0), 0.8, m_s, "sss"))
    res.add_mesh(_ground_mesh(m_g))
    _fused_vs_xla_on_tpu(settings, res)


def test_fused_sss_random_walk_on_tpu():
    """r04 random-walk SSS (XLA pre-stage planes overriding the compiled
    S2/full kernel's sampled lobe) on hardware."""
    from metal_pathtracer_tpu import constants as C
    from metal_pathtracer_tpu.scene.resources import Material, SceneResources
    from metal_pathtracer_tpu.settings import RenderSettings, SssMode
    from metal_pathtracer_tpu.utils.benchscene import (
        _ground_mesh,
        _sphere_mesh,
    )

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 4
    settings.fixedRngSeed = 23
    settings.sssMode = SssMode.RANDOM_WALK
    res = SceneResources()
    m_s = res.add_material(Material(
        mat_type=C.MATERIAL_SUBSURFACE, base_color=(0.8, 0.4, 0.2),
        sss_mfp=0.25, sss_g=0.2, sss_method=1, ior=1.4))
    m_g = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    res.add_mesh(_sphere_mesh(2, (0.0, 0.6, 0), 0.8, m_s, "sss"))
    res.add_mesh(_ground_mesh(m_g))
    _fused_vs_xla_on_tpu(settings, res)

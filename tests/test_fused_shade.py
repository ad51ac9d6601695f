"""Fused shading megakernel vs the XLA reference integrator.

The fused path (ops/pallas/shade.py) must reproduce the XLA wavefront
body bit-for-bit on every config it claims (fused_supported). On CPU the
kernel runs under the Pallas interpreter (MPT_FUSED_INTERPRET=1);
tests/tpu re-runs the comparison compiled on hardware.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from metal_pathtracer_tpu import constants as C
from metal_pathtracer_tpu.ops.camera import build_camera
from metal_pathtracer_tpu.renderer import frame
from metal_pathtracer_tpu.renderer.accumulation import RenderState
from metal_pathtracer_tpu.scene.resources import Material, SceneResources
from metal_pathtracer_tpu.schema import settings_to_static, settings_to_uniforms
from metal_pathtracer_tpu.settings import BackgroundMode, RenderSettings
from metal_pathtracer_tpu.utils.benchscene import _ground_mesh, _sphere_mesh
from metal_pathtracer_tpu.utils.procgen import dragon_class_scene_mesh


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setenv("MPT_FUSED_INTERPRET", "1")


def _render(scene, settings, res, w, h, spp=2):
    static = settings_to_static(settings, w, h, res.material_types_present())
    uni = settings_to_uniforms(settings, build_camera(settings, w, h), 0, 0)
    st = frame.render_samples(scene, uni, RenderState.create(w, h),
                              static, spp)
    return (np.asarray(st.present()),
            float(np.asarray(st.ray_count)))


def _compare(settings, res, w=40, h=24, min_exact=0.98,
             max_rmse=2e-4):
    import jax

    scene = res.build_arrays()
    assert not os.environ.get("MPT_FUSED_INTERPRET")
    img_ref, rays_ref = _render(scene, settings, res, w, h)
    # env toggles are read at TRACE time — drop compiled executables or the
    # second render silently reuses the first path's jit cache entry
    jax.clear_caches()
    os.environ["MPT_FUSED_INTERPRET"] = "1"
    try:
        from metal_pathtracer_tpu.ops.pallas import shade
        static = settings_to_static(settings, w, h,
                                    res.material_types_present())
        assert shade.fused_supported(scene, static)
        img_fused, rays_fused = _render(scene, settings, res, w, h)
    finally:
        del os.environ["MPT_FUSED_INTERPRET"]
        jax.clear_caches()
    # The kernel body compiles separately from the XLA path, so FMA
    # contraction introduces ~1-ulp float drift; a drifted compare at a
    # branch boundary (RR survival, Fresnel lobe pick) can flip rare
    # lanes entirely. Tight statistical parity, not bitwise:
    assert abs(rays_fused - rays_ref) <= max(4.0, 1e-4 * rays_ref)
    d = np.abs(img_fused - img_ref)
    rmse = float(np.sqrt((d * d).mean()))
    frac_exact = float((d.max(-1) < 1e-5).mean())
    assert rmse < max_rmse, (rmse, float(d.max()))
    # min_exact: flat triangles keep >98% of pixels bit-ish exact; curved
    # analytic prims re-derive normals from the drifted hit position every
    # bounce, so drift compounds (depth-1 renders ARE exact — verified)
    # while ray counts/branches stay identical.
    assert frac_exact > min_exact, frac_exact


def test_fused_matches_xla_lambert_gradient():
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 3.2
    settings.cameraYaw = 0.4
    settings.cameraPitch = 0.25
    settings.maxDepth = 4
    settings.fixedRngSeed = 1234
    res = SceneResources()
    res.add_material(Material(base_color=(0.7, 0.7, 0.7)))
    res.add_mesh(dragon_class_scene_mesh(2, material=0))
    _compare(settings, res)


def test_fused_matches_xla_full_type_set():
    """metal (rough + mirror), dielectric with absorbing interior (medium
    stack), diffuse light, lambert ground — every phase-1 branch."""
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
    m3 = res.add_material(Material(mat_type=C.MATERIAL_METAL,
                                   base_color=(0.9, 0.9, 0.9),
                                   roughness=0.0))
    m4 = res.add_material(Material(mat_type=C.MATERIAL_DIFFUSE_LIGHT,
                                   emission=(6.0, 5.0, 4.0)))
    res.add_mesh(_sphere_mesh(2, (0, 0, 0), 1.0, m1, "glass"))
    res.add_mesh(_sphere_mesh(2, (-2.2, 0, 0), 1.0, m2, "metal-r"))
    res.add_mesh(_sphere_mesh(2, (2.2, 0, 0), 1.0, m3, "mirror"))
    res.add_mesh(_sphere_mesh(1, (0, 2.0, 0), 0.5, m4, "lamp"))
    res.add_mesh(_ground_mesh(m0))
    _compare(settings, res)


def test_fused_matches_xla_solid_background_rr():
    """Solid background + deep depth so Russian roulette branches run."""
    from metal_pathtracer_tpu.settings import BackgroundMode

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 3.0
    settings.maxDepth = 8
    settings.fixedRngSeed = 99
    settings.backgroundMode = BackgroundMode.SOLID
    settings.backgroundColor = (0.9, 0.6, 0.3)
    res = SceneResources()
    res.add_material(Material(base_color=(0.85, 0.85, 0.85)))
    res.add_mesh(dragon_class_scene_mesh(2, material=0))
    res.add_mesh(_ground_mesh(0))
    _compare(settings, res)


def test_fused_matches_xla_sphere_scene():
    """Pure analytic scene (RTOW class): no triangles at all — lambert
    ground sphere + metal + dielectric under the gradient sky."""
    from metal_pathtracer_tpu.scene.resources import Sphere

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.5, 0.0)
    settings.cameraDistance = 4.0
    settings.cameraYaw = 0.3
    settings.cameraPitch = 0.15
    settings.maxDepth = 6
    settings.fixedRngSeed = 99
    res = SceneResources()
    m_g = res.add_material(Material(base_color=(0.5, 0.5, 0.5)))
    m_m = res.add_material(Material(base_color=(0.8, 0.7, 0.4),
                                    mat_type=C.MATERIAL_METAL,
                                    roughness=0.2))
    m_d = res.add_material(Material(mat_type=C.MATERIAL_DIELECTRIC,
                                    ior=1.5))
    res.spheres.append(Sphere(center=(0, -100, 0), radius=100.0,
                              material=m_g))
    res.spheres.append(Sphere(center=(-1.1, 0.5, 0), radius=0.5,
                              material=m_m))
    res.spheres.append(Sphere(center=(1.1, 0.5, 0), radius=0.5,
                              material=m_d))
    # depth-1 is bit-exact; multi-bounce curved-surface drift compounds
    _compare(settings, res, min_exact=0.8)


def test_fused_matches_xla_mixed_prims_light_sphere():
    """Triangles + spheres + a non-light rect + an EMISSIVE sphere: the
    merged trace's tie order, two_sided emission, and triangle-only
    self-exclusion all in one scene."""
    from metal_pathtracer_tpu.scene.resources import Rect, Sphere

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.5, 0.0)
    settings.cameraDistance = 4.5
    settings.cameraYaw = -0.4
    settings.cameraPitch = 0.2
    settings.maxDepth = 5
    settings.fixedRngSeed = 4242
    res = SceneResources()
    m_mesh = res.add_material(Material(base_color=(0.6, 0.3, 0.3)))
    m_s = res.add_material(Material(base_color=(0.3, 0.4, 0.7)))
    m_l = res.add_material(Material(mat_type=C.MATERIAL_DIFFUSE_LIGHT,
                                    emission=(9.0, 8.0, 7.0)))
    m_r = res.add_material(Material(base_color=(0.5, 0.5, 0.45)))
    res.add_mesh(dragon_class_scene_mesh(2, material=m_mesh))
    res.spheres.append(Sphere(center=(1.4, 0.4, 0.6), radius=0.4,
                              material=m_s))
    res.spheres.append(Sphere(center=(-1.2, 1.6, -0.5), radius=0.35,
                              material=m_l))
    res.rects.append(Rect(
        corner=np.array([-3, -0.8, -3], np.float32),
        edge_u=np.array([6, 0, 0], np.float32),
        edge_v=np.array([0, 0, 6], np.float32),
        normal=np.array([0, 1, 0], np.float32),
        material=m_r, two_sided=False))
    _compare(settings, res, min_exact=0.8)


def test_fused_matches_xla_cornell_rect_nee():
    """The cornell class: rect geometry + emissive rect lights with NEE +
    MIS through the fused S1/shadow/S2 split (reference's canonical
    scene, pathtrace.metal sample_rect_light/NEE:6487-6556)."""
    from metal_pathtracer_tpu.scene import dsl

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
    # pure-rect: flat geometry -> measured 100% exact at depth 4
    _compare(settings, res)


def test_fused_matches_xla_cornell_with_metal_sphere():
    """Cornell + a curved metal sphere: rect NEE over mixed prim
    families; curved-bounce drift bounds apply (see _compare note).
    Spec-NEE must be off: with delta-capable types + rect lights the XLA
    path adds delta-chain estimators the kernel lacks (gate enforces)."""
    from metal_pathtracer_tpu.scene import dsl

    settings = RenderSettings()
    settings.enableSpecularNee = False
    settings.enableMnee = False
    res = SceneResources()
    dsl.parse_scene(
        "camera target=0,1,0 distance=3.9 yaw=1.5708 pitch=0 vfov=40\n"
        "renderer maxDepth=4 seed=7\n"
        "material type=lambert albedo=0.73,0.73,0.73\n"
        "material type=lambert albedo=0.65,0.05,0.05\n"
        "material type=lambert albedo=0.12,0.45,0.15\n"
        "material type=light emit=15,15,15\n"
        "material type=metal albedo=0.9,0.85,0.7 roughness=0.15\n"
        "rectangle x=-1,1 y=0 z=-1,1 normal=1 material=0\n"
        "rectangle x=-1,1 y=2 z=-1,1 normal=-1 material=0\n"
        "rectangle x=-1 y=0,2 z=-1,1 normal=1 material=2\n"
        "rectangle x=1 y=0,2 z=-1,1 normal=-1 material=1\n"
        "rectangle x=-1,1 y=0,2 z=-1 normal=1 material=0\n"
        "rectangle x=-0.4,0.4 y=1.99 z=-0.4,0.4 normal=-1 material=3\n"
        "sphere center=0.35,0.35,0.3 radius=0.35 material=4\n",
        settings, res)
    _compare(settings, res, min_exact=0.8, max_rmse=1e-3)


def test_fused_matches_xla_instanced():
    """Instanced groups through the fused path: the merged trace folds
    trace_instanced (world-space records pass through the precomputed
    rows flavor) + a soup ground mesh, with per-instance self-exclusion
    preserved."""
    import math

    from metal_pathtracer_tpu.utils.procgen import dragon_class_mesh
    from metal_pathtracer_tpu.scene.resources import Mesh

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
    _compare(settings, res, min_exact=0.9)


def test_fused_matches_xla_env_specnee_glass():
    """Spec-NEE delta chains with an env map and a glass mesh — the
    reference DEFAULT configuration (enableSpecularNee=True). The fused
    S2 exports feed specnee.delta_chain_estimators XLA-side; parity vs
    the monolithic XLA body."""
    import jax

    settings, res, environment = _bench_like_scene(False)
    settings.enableSpecularNee = True
    settings.enableMnee = False
    m_glass = res.add_material(Material(mat_type=C.MATERIAL_DIELECTRIC,
                                        ior=1.5))
    res.add_mesh(_sphere_mesh(2, (0.0, 1.8, 0.0), 0.7, m_glass, "orb"))
    scene = res.build_arrays(environment=environment)
    w, h = 40, 24
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    img_ref, rays_ref = _render(scene, settings, res, w, h)
    jax.clear_caches()
    os.environ["MPT_FUSED_INTERPRET"] = "1"
    try:
        from metal_pathtracer_tpu.ops.pallas import shade
        assert shade.fused_supported(scene, static)
        img_fused, rays_fused = _render(scene, settings, res, w, h)
    finally:
        del os.environ["MPT_FUSED_INTERPRET"]
        jax.clear_caches()
    assert abs(rays_fused - rays_ref) <= max(4.0, 1e-4 * rays_ref)
    d = np.abs(img_fused - img_ref)
    rmse = float(np.sqrt((d * d).mean()))
    assert rmse < 5e-3, (rmse, float(d.max()))
    assert float((d.max(-1) < 1e-4).mean()) > 0.8


def test_fused_matches_xla_cornell_specnee_mnee_glass():
    """Rect-light delta chains INCLUDING the MNEE secondary chain:
    cornell + a glass sphere with enableSpecularNee + enableMnee on
    (the reference defaults + MNEE)."""
    from metal_pathtracer_tpu.scene import dsl

    settings = RenderSettings()
    settings.enableSpecularNee = True
    settings.enableMnee = True
    res = SceneResources()
    dsl.parse_scene(
        "camera target=0,1,0 distance=3.9 yaw=1.5708 pitch=0 vfov=40\n"
        "renderer maxDepth=5 seed=7\n"
        "material type=lambert albedo=0.73,0.73,0.73\n"
        "material type=lambert albedo=0.65,0.05,0.05\n"
        "material type=lambert albedo=0.12,0.45,0.15\n"
        "material type=light emit=15,15,15\n"
        "material type=dielectric ior=1.5\n"
        "rectangle x=-1,1 y=0 z=-1,1 normal=1 material=0\n"
        "rectangle x=-1,1 y=2 z=-1,1 normal=-1 material=0\n"
        "rectangle x=-1 y=0,2 z=-1,1 normal=1 material=2\n"
        "rectangle x=1 y=0,2 z=-1,1 normal=-1 material=1\n"
        "rectangle x=-1,1 y=0,2 z=-1 normal=1 material=0\n"
        "rectangle x=-0.4,0.4 y=1.99 z=-0.4,0.4 normal=-1 material=3\n"
        "sphere center=0.35,0.5,0.3 radius=0.4 material=4\n",
        settings, res)
    _compare(settings, res, min_exact=0.75, max_rmse=1e-3)


def test_fused_gate_rejects_unsupported():
    """Configs outside the kernel's coverage must take the XLA path."""
    from metal_pathtracer_tpu.ops.pallas import shade

    settings = RenderSettings()
    res = SceneResources()
    res.add_material(Material(base_color=(0.5, 0.5, 0.5)))
    res.add_mesh(dragon_class_scene_mesh(1, material=0))
    os.environ["MPT_FUSED_INTERPRET"] = "1"
    try:
        scene = res.build_arrays()
        static = settings_to_static(settings, 8, 8,
                                    res.material_types_present())
        assert shade.fused_supported(scene, static)
        # sphere scenes are covered (r03); rect LIGHTS still fall back
        res2 = SceneResources()
        res2.add_material(Material(base_color=(0.5, 0.5, 0.5)))
        res2.add_mesh(dragon_class_scene_mesh(1, material=0))
        from metal_pathtracer_tpu.scene.resources import Sphere
        res2.spheres.append(Sphere(center=(0, 0, 0), radius=1.0, material=0))
        static2 = settings_to_static(settings, 8, 8,
                                     res2.material_types_present())
        assert shade.fused_supported(res2.build_arrays(), static2)
        res3 = SceneResources()
        res3.add_material(Material(base_color=(0.5, 0.5, 0.5)))
        light = res3.add_material(Material(mat_type=C.MATERIAL_DIFFUSE_LIGHT,
                                           emission=(5, 5, 5)))
        res3.add_mesh(dragon_class_scene_mesh(1, material=0))
        import numpy as _np
        from metal_pathtracer_tpu.scene.resources import Rect
        res3.rects.append(Rect(
            corner=_np.array([-1, 2, -1], _np.float32),
            edge_u=_np.array([2, 0, 0], _np.float32),
            edge_v=_np.array([0, 0, 2], _np.float32),
            normal=_np.array([0, -1, 0], _np.float32),
            material=light, two_sided=False))
        static3b = settings_to_static(settings, 8, 8,
                                      res3.material_types_present())
        # rect lights are covered for sky/solid backgrounds (r03)...
        assert shade.fused_supported(res3.build_arrays(), static3b)
        # ...and rect NEE + env NEE together is covered (r04: second
        # shadow split, esmp bank per light integral)
        s_env = RenderSettings()
        s_env.backgroundMode = BackgroundMode.ENVIRONMENT
        s_env.enableSpecularNee = False
        s_env.enableMnee = False
        static3c = settings_to_static(s_env, 8, 8,
                                      res3.material_types_present())
        assert shade.fused_supported(res3.build_arrays(environment=_toy_env()),
                                     static3c)
        # ...and rect lights + spec-NEE + delta types are now covered via
        # the XLA-side chain estimators over the S2 exports
        res3.add_material(Material(mat_type=C.MATERIAL_DIELECTRIC))
        static3d = settings_to_static(settings, 8, 8,
                                      res3.material_types_present())
        assert settings.enableSpecularNee  # the default
        assert shade.fused_supported(res3.build_arrays(), static3d)
        # SSS is fused (separable/fallback in-kernel; random-walk lanes
        # override via the XLA pre-stage planes)
        res4 = SceneResources()
        res4.add_material(Material(base_color=(0.5, 0.5, 0.5)))
        res4.add_material(Material(mat_type=C.MATERIAL_SUBSURFACE))
        res4.add_mesh(dragon_class_scene_mesh(1, material=1))
        static4 = settings_to_static(settings, 8, 8,
                                     res4.material_types_present())
        assert shade.fused_supported(res4.build_arrays(), static4)
        # env background with NO environment map falls back
        settings.backgroundMode = BackgroundMode.ENVIRONMENT
        static3 = settings_to_static(settings, 8, 8,
                                     res.material_types_present())
        assert not shade.fused_supported(scene, static3)
    finally:
        del os.environ["MPT_FUSED_INTERPRET"]


def test_fused_matches_xla_pbr_untextured():
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 4.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 5
    settings.fixedRngSeed = 21
    res = SceneResources()
    g = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    p1 = res.add_material(Material(mat_type=C.MATERIAL_PBR,
                                   base_color=(0.8, 0.3, 0.2),
                                   roughness=0.4, pbr_metallic=0.8))
    p2 = res.add_material(Material(mat_type=C.MATERIAL_PBR,
                                   base_color=(0.9, 0.9, 0.9),
                                   roughness=0.1, pbr_transmission=0.9,
                                   ior=1.5, pbr_thickness=0.3,
                                   dielectric_sigma_a=(0.5, 0.1, 0.1)))
    res.add_mesh(_sphere_mesh(2, (-1.3, 0, 0), 1.0, p1, "metallic"))
    res.add_mesh(_sphere_mesh(2, (1.3, 0, 0), 1.0, p2, "transmissive"))
    res.add_mesh(_ground_mesh(g))
    _compare(settings, res)


def _bench_like_scene(textured):
    """The upgraded-bench configuration at toy scale: HDR env alias NEE +
    dielectric + (textured) PBR + lambert."""
    from metal_pathtracer_tpu.utils.benchscene import (
        build_bench_scene,
    )

    settings, res, environment = build_bench_scene(subdivisions=3)
    settings.maxDepth = 5
    if not textured:
        res.texture_images.clear()
        res.texture_srgb.clear()
        res.texture_wrap.clear()
        for m in res.materials:
            m.texture_indices = (-1, -1, -1, -1, -1, -1)
    return settings, res, environment


def test_fused_matches_xla_env_nee_spheres():
    """Env alias NEE over ANALYTIC prims: the merged any-hit shadow trace
    (spheres occluding env light) through the fused S1/shadow/S2 split."""
    import jax

    from metal_pathtracer_tpu.scene.resources import Sphere

    settings, res, environment = _bench_like_scene(False)
    # replace the meshes with spheres so the shadow rays must hit the
    # analytic any-hit path
    res.meshes.clear()
    m_g = res.add_material(Material(base_color=(0.55, 0.55, 0.5)))
    res.spheres.append(Sphere(center=(0, -30, 0), radius=30.0,
                              material=m_g))
    res.spheres.append(Sphere(center=(-1.2, 0.6, 0), radius=0.6,
                              material=0))
    res.spheres.append(Sphere(center=(1.2, 0.6, 0), radius=0.6,
                              material=m_g))
    scene = res.build_arrays(environment=environment)
    w, h = 40, 24
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    img_ref, rays_ref = _render(scene, settings, res, w, h)
    jax.clear_caches()
    os.environ["MPT_FUSED_INTERPRET"] = "1"
    try:
        from metal_pathtracer_tpu.ops.pallas import shade
        assert shade.fused_supported(scene, static)
        img_fused, rays_fused = _render(scene, settings, res, w, h)
    finally:
        del os.environ["MPT_FUSED_INTERPRET"]
        jax.clear_caches()
    assert abs(rays_fused - rays_ref) <= max(4.0, 1e-4 * rays_ref)
    d = np.abs(img_fused - img_ref)
    rmse = float(np.sqrt((d * d).mean()))
    assert rmse < 5e-3, (rmse, float(d.max()))
    assert float((d.max(-1) < 1e-4).mean()) > 0.8


@pytest.mark.parametrize("textured", [False, True])
def test_fused_matches_xla_env_nee(textured):
    """The headline-bench config: env alias NEE + MIS through the fused
    S1/alias/shadow/S2 pipeline vs the XLA reference."""
    import jax

    settings, res, environment = _bench_like_scene(textured)
    scene = res.build_arrays(environment=environment)
    w, h = 40, 24
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    img_ref, rays_ref = _render(scene, settings, res, w, h)
    shadow_ref = None
    jax.clear_caches()
    os.environ["MPT_FUSED_INTERPRET"] = "1"
    try:
        from metal_pathtracer_tpu.ops.pallas import shade
        assert shade.fused_supported(scene, static)
        img_fused, rays_fused = _render(scene, settings, res, w, h)
    finally:
        del os.environ["MPT_FUSED_INTERPRET"]
        jax.clear_caches()
    assert abs(rays_fused - rays_ref) <= max(4.0, 1e-4 * rays_ref)
    d = np.abs(img_fused - img_ref)
    rmse = float(np.sqrt((d * d).mean()))
    frac_exact = float((d.max(-1) < 1e-4).mean())
    assert rmse < 5e-3, (rmse, float(d.max()))
    assert frac_exact > 0.95, frac_exact


def _compare_with_env(settings, res, environment, w=40, h=24,
                      min_exact=0.95, max_rmse=5e-3):
    import jax

    scene = res.build_arrays(environment=environment)
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    img_ref, rays_ref = _render(scene, settings, res, w, h)
    jax.clear_caches()
    os.environ["MPT_FUSED_INTERPRET"] = "1"
    try:
        from metal_pathtracer_tpu.ops.pallas import shade
        assert shade.fused_supported(scene, static)
        img_fused, rays_fused = _render(scene, settings, res, w, h)
    finally:
        del os.environ["MPT_FUSED_INTERPRET"]
        jax.clear_caches()
    assert abs(rays_fused - rays_ref) <= max(4.0, 1e-4 * rays_ref)
    d = np.abs(img_fused - img_ref)
    rmse = float(np.sqrt((d * d).mean()))
    frac_exact = float((d.max(-1) < 1e-4).mean())
    assert rmse < max_rmse, (rmse, float(d.max()))
    assert frac_exact > min_exact, frac_exact


def _cornell_text(extra_mats="", extra_prims="", light_mat=3,
                  light_line=None, max_depth=4):
    light = light_line or (
        f"rectangle x=-0.4,0.4 y=1.99 z=-0.4,0.4 normal=-1 "
        f"material={light_mat}\n")
    return (
        "camera target=0,1,0 distance=3.9 yaw=1.5708 pitch=0 vfov=40\n"
        f"renderer maxDepth={max_depth} seed=7\n"
        "material type=lambert albedo=0.73,0.73,0.73\n"
        "material type=lambert albedo=0.65,0.05,0.05\n"
        "material type=lambert albedo=0.12,0.45,0.15\n"
        "material type=light emit=15,15,15\n"
        + extra_mats +
        "rectangle x=-1,1 y=0 z=-1,1 normal=1 material=0\n"
        "rectangle x=-1 y=0,2 z=-1,1 normal=1 material=2\n"
        "rectangle x=1 y=0,2 z=-1,1 normal=-1 material=1\n"
        "rectangle x=-1,1 y=0,2 z=-1 normal=1 material=0\n"
        + light + extra_prims)


def _toy_env():
    from metal_pathtracer_tpu.ops import env as env_ops

    h, w = 16, 32
    texels = np.full((h, w, 3), 0.25, np.float32)
    texels[3:6, 6:9] = (40.0, 35.0, 28.0)   # hot sun block
    texels[:, :, 2] += 0.15                  # blue-ish sky
    return env_ops.environment_from_texels(jnp.asarray(texels))


def test_fused_matches_xla_cornell_under_env():
    """Rect-light NEE + env NEE TOGETHER (open cornell under an HDR env):
    the r03 verdict's first fused-shade gate — two shadow splits per
    depth, rect esmp bank committed before env (the integrator's order;
    reference runs both blocks in pathtrace.metal:6487-6648)."""
    from metal_pathtracer_tpu.scene import dsl

    settings = RenderSettings()
    res = SceneResources()
    # ceiling removed so env light enters; rect light stays
    dsl.parse_scene(_cornell_text(), settings, res)
    settings.backgroundMode = BackgroundMode.ENVIRONMENT
    _compare_with_env(settings, res, _toy_env(), min_exact=0.90)


def test_fused_matches_xla_cornell_under_env_glass_chains():
    """rect+env NEE together with spec-NEE/MNEE delta chains on a glass
    sphere — the full reference-default feature set in one scene."""
    from metal_pathtracer_tpu.scene import dsl

    settings = RenderSettings()
    settings.enableSpecularNee = True
    settings.enableMnee = True
    res = SceneResources()
    dsl.parse_scene(
        _cornell_text(
            extra_mats="material type=dielectric ior=1.5\n",
            extra_prims="sphere center=0.35,0.5,0.3 radius=0.4 material=4\n",
            max_depth=5),
        settings, res)
    settings.backgroundMode = BackgroundMode.ENVIRONMENT
    _compare_with_env(settings, res, _toy_env(), min_exact=0.70,
                      max_rmse=1e-3)


def test_fused_matches_xla_textured_pbr_mixed_prims():
    """Textured PBR soup triangles + analytic sphere/rect in ONE fused
    frame — the real-scene shape (textured glTF mesh + analytic floor)
    the reference shades in its single kernel (pathtrace.metal:5919-6424).
    Non-triangle winners must take the texture stage's identity planes by
    their TRUE material id (the r04 verdict's last fused gate)."""
    import jax

    from metal_pathtracer_tpu.scene.resources import Rect, Sphere

    settings, res, environment = _bench_like_scene(True)
    # analytic floor + a metal sphere alongside the textured PBR mesh
    m_floor = res.add_material(Material(base_color=(0.6, 0.55, 0.5)))
    m_metal = res.add_material(Material(
        mat_type=C.MATERIAL_METAL, base_color=(0.9, 0.7, 0.4),
        roughness=0.05))
    res.rects.append(Rect(
        corner=np.array([-40.0, 0.0, -40.0], np.float32),
        edge_u=np.array([80.0, 0.0, 0.0], np.float32),
        edge_v=np.array([0.0, 0.0, 80.0], np.float32),
        normal=np.array([0.0, 1.0, 0.0], np.float32),
        material=m_floor, two_sided=False))
    res.spheres.append(Sphere(center=(-1.6, 0.6, 0.4), radius=0.6,
                              material=m_metal))
    scene = res.build_arrays(environment=environment)
    w, h = 40, 24
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    assert scene.textures is not None and _scene_has_prims_check(scene)
    img_ref, rays_ref = _render(scene, settings, res, w, h)
    jax.clear_caches()
    os.environ["MPT_FUSED_INTERPRET"] = "1"
    try:
        from metal_pathtracer_tpu.ops.pallas import shade
        assert shade.fused_supported(scene, static)
        img_fused, rays_fused = _render(scene, settings, res, w, h)
    finally:
        del os.environ["MPT_FUSED_INTERPRET"]
        jax.clear_caches()
    assert abs(rays_fused - rays_ref) <= max(4.0, 1e-4 * rays_ref)
    d = np.abs(img_fused - img_ref)
    rmse = float(np.sqrt((d * d).mean()))
    assert rmse < 5e-3, (rmse, float(d.max()))
    assert float((d.max(-1) < 1e-4).mean()) > 0.8


def _scene_has_prims_check(scene):
    from metal_pathtracer_tpu.ops.pallas.shade import _scene_has_prims
    return _scene_has_prims(scene)


def test_fused_matches_xla_env_modulated_light():
    """emission_env lights under an env background (the reference's
    env-modulated rect emission, mnee.metal:34-41 / SceneManager
    emitEnv): the fused S1 multiplies the XLA-gathered
    environment_color(-shading_normal) plane into the hit emission."""
    from metal_pathtracer_tpu.scene import dsl

    settings = RenderSettings()
    res = SceneResources()
    dsl.parse_scene(
        _cornell_text(
            light_line=("rectangle x=-0.4,0.4 y=1.99 z=-0.4,0.4 normal=-1 "
                        "material=3 emitEnv=1\n")),
        settings, res)
    settings.backgroundMode = BackgroundMode.ENVIRONMENT
    _compare_with_env(settings, res, _toy_env(), min_exact=0.90)


def test_fused_matches_xla_multislot_textures():
    """Full six-slot texture matrix through the fused path (r03 verdict
    gate: base-color-opaque only): base + ORM + normal map + occlusion +
    emissive slots on one PBR sphere, alpha-MASK cutouts on a second, and
    alpha-BLEND (one RNG draw per blend lane, reference :6215) on a third.
    The XLA texture pre-stage computes all slots; the kernel consumes the
    override planes incl. the normal-mapped shading normal."""
    rng = np.random.default_rng(3)

    def tex(h, w, lo, hi):
        out = np.full((h, w, 4), 255, np.uint8)
        out[..., :3] = np.clip(
            (lo + (hi - lo) * rng.random((h, w, 3))) * 255.0,
            0, 255).astype(np.uint8)
        return out

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.5, 0.0)
    settings.cameraDistance = 4.5
    settings.cameraPitch = 0.25
    settings.maxDepth = 4
    settings.fixedRngSeed = 11
    res = SceneResources()
    # 0: base color, 1: ORM, 2: normal map, 3: emissive, 4: alpha-mask base
    res.texture_images.append(tex(16, 16, 0.2, 0.9))
    res.texture_srgb.append(True)
    res.texture_wrap.append((0, 0))
    res.texture_images.append(tex(8, 8, 0.1, 1.0))      # occ/rough/metal
    res.texture_srgb.append(False)
    res.texture_wrap.append((0, 0))
    nm = np.full((8, 8, 4), 255, np.uint8)
    nm[..., 0] = (128 + 76 * (rng.random((8, 8)) - 0.5)).astype(np.uint8)
    nm[..., 1] = (128 + 76 * (rng.random((8, 8)) - 0.5)).astype(np.uint8)
    res.texture_images.append(nm)
    res.texture_srgb.append(False)
    res.texture_wrap.append((0, 0))
    res.texture_images.append(tex(8, 8, 0.4, 1.0))
    res.texture_srgb.append(True)
    res.texture_wrap.append((0, 0))
    mask = np.full((8, 8, 4), 204, np.uint8)
    mask[::2, ::2, 3] = 25                               # cutout texels
    res.texture_images.append(mask)
    res.texture_srgb.append(True)
    res.texture_wrap.append((0, 0))

    m_full = res.add_material(Material(
        mat_type=C.MATERIAL_PBR, base_color=(0.9, 0.8, 0.7),
        roughness=0.6, pbr_metallic=0.4, emission=(0.5, 0.4, 0.3),
        texture_indices=(0, 1, 2, 1, 3, -1)))
    m_mask = res.add_material(Material(
        mat_type=C.MATERIAL_PBR, base_color=(0.3, 0.6, 0.9),
        roughness=0.8, pbr_alpha_mode=1, pbr_alpha_cutoff=0.5,
        texture_indices=(4, -1, -1, -1, -1, -1)))
    m_blend = res.add_material(Material(
        mat_type=C.MATERIAL_PBR, base_color=(0.8, 0.3, 0.3),
        roughness=0.5, pbr_alpha_mode=2, pbr_alpha=0.55,
        texture_indices=(0, -1, -1, -1, -1, -1)))
    m_ground = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    res.add_mesh(_sphere_mesh(2, (0, 0.6, 0), 0.8, m_full, "full"))
    res.add_mesh(_sphere_mesh(2, (-1.9, 0.6, 0), 0.8, m_mask, "mask"))
    res.add_mesh(_sphere_mesh(2, (1.9, 0.6, 0), 0.8, m_blend, "blend"))
    res.add_mesh(_ground_mesh(m_ground))
    scene = res.build_arrays()
    assert not scene.tex_base_only_opaque  # this test must cover the gate
    _compare(settings, res, min_exact=0.80, max_rmse=1e-3)


def _many_material_scene(metal: bool, max_depth: int):
    """48 materials / 48 spheres, one material per sphere (past the old
    32-row fused gate)."""
    from metal_pathtracer_tpu.scene.resources import Sphere

    rng = np.random.default_rng(5)
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 9.0
    settings.cameraPitch = 0.35
    settings.maxDepth = max_depth
    settings.fixedRngSeed = 21
    res = SceneResources()
    for i in range(48):
        c = tuple(float(x) for x in rng.uniform(0.2, 0.95, 3))
        if metal and i % 5 == 4:
            res.add_material(Material(mat_type=C.MATERIAL_METAL,
                                      base_color=c,
                                      roughness=float(rng.uniform(0, 0.6))))
        else:
            res.add_material(Material(base_color=c))
    for i in range(48):
        x = (i % 8) * 1.4 - 4.9
        z = (i // 8) * 1.4 - 3.5
        res.spheres.append(Sphere(center=(x, 0.0, z), radius=0.55,
                                  material=i))
    scene = res.build_arrays()
    assert scene.materials.count > 32
    return settings, res


def test_fused_matches_xla_plastic():
    """PLASTIC (coat GGX over tinted lambert, reference
    pathtrace.metal:5285-5419) on flat triangle spheres: the fused
    sampler/eval must match the XLA branch including the coat selector's
    RNG draw discipline.

    Coat roughness stays >= 0.15 here: the reference has NO delta
    carve-out for plastic, so a near-smooth coat samples GGX at
    alpha=1e-4 whose pdf hits the min_specular_pdf clamp — ~13x firefly
    weights where a 1-ulp input drift flips whole lanes (measured: the
    sampler is BIT-identical under controlled inputs at that roughness,
    rough-coat renders are 1e-6-exact through 4 bounces, near-smooth
    renders diverge at depth 2 with +-4 ray-count flips). The smooth
    regime is covered at depth 1 below, where renders are exact."""
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 4
    settings.fixedRngSeed = 9
    res = SceneResources()
    m_red = res.add_material(Material(
        mat_type=C.MATERIAL_PLASTIC, base_color=(0.6, 0.1, 0.1),
        coat_roughness=0.15, coat_thickness=0.4,
        coat_tint=(0.9, 0.95, 1.0), coat_absorption=(0.2, 0.1, 0.05),
        ior=1.5))
    m_rough = res.add_material(Material(
        mat_type=C.MATERIAL_PLASTIC, base_color=(0.1, 0.4, 0.7),
        coat_roughness=0.3, ior=1.6))
    m_ground = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    res.add_mesh(_sphere_mesh(2, (-1.0, 0.6, 0), 0.8, m_red, "red"))
    res.add_mesh(_sphere_mesh(2, (1.0, 0.6, 0), 0.8, m_rough, "rough"))
    res.add_mesh(_ground_mesh(m_ground))
    _compare(settings, res, min_exact=0.95, max_rmse=1e-4)


def test_fused_matches_xla_carpaint():
    """CARPAINT (coat + procedural-flake + base lobes, reference
    pathtrace.metal:3371-3536, 5508-5633): the flake-normal hash is a
    function of the hit POSITION, so this also pins the kernel's hit
    point to the XLA record's (1-ulp drift would decorrelate flakes)."""
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 3
    settings.fixedRngSeed = 13
    res = SceneResources()
    m_cp = res.add_material(Material(
        mat_type=C.MATERIAL_CARPAINT, base_color=(0.5, 0.05, 0.05),
        coat_roughness=0.2, carpaint_base_metallic=0.3,
        carpaint_base_roughness=0.25, carpaint_flake_sample_weight=0.2,
        carpaint_flake_roughness=0.2, carpaint_flake_scale=8.0,
        carpaint_flake_normal_strength=0.5, ior=1.5))
    m_ground = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    res.add_mesh(_sphere_mesh(2, (0.0, 0.6, 0), 0.8, m_cp, "paint"))
    res.add_mesh(_ground_mesh(m_ground))
    _compare(settings, res, min_exact=0.95, max_rmse=1e-4)


def test_fused_matches_xla_carpaint_env():
    """CARPAINT under env NEE: the 3-lobe eval in the MIS weights + the
    base-roughness lrough export."""
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 3
    settings.fixedRngSeed = 17
    settings.backgroundMode = BackgroundMode.ENVIRONMENT
    res = SceneResources()
    m_cp = res.add_material(Material(
        mat_type=C.MATERIAL_CARPAINT, base_color=(0.1, 0.2, 0.6),
        coat_roughness=0.15, carpaint_base_metallic=0.7,
        carpaint_base_roughness=0.3, carpaint_flake_sample_weight=0.15,
        carpaint_flake_roughness=0.25, carpaint_flake_scale=6.0,
        carpaint_flake_normal_strength=0.4,
        carpaint_base_eta=(1.2, 0.9, 0.6), carpaint_base_k=(3.0, 2.5, 2.0),
        ior=1.5))
    m_ground = res.add_material(Material(base_color=(0.5, 0.5, 0.5)))
    res.add_mesh(_sphere_mesh(2, (0.0, 0.6, 0), 0.8, m_cp, "paint"))
    res.add_mesh(_ground_mesh(m_ground))
    _compare_with_env(settings, res, _toy_env(), min_exact=0.93,
                      max_rmse=1e-4)


def _sss_scene(sss_method=0, mfp=0.25):
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 4
    settings.fixedRngSeed = 23
    res = SceneResources()
    m_s = res.add_material(Material(
        mat_type=C.MATERIAL_SUBSURFACE, base_color=(0.8, 0.4, 0.2),
        sss_mfp=mfp, sss_g=0.2, sss_method=sss_method, ior=1.4))
    m_ground = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    res.add_mesh(_sphere_mesh(2, (0.0, 0.6, 0), 0.8, m_s, "sss"))
    res.add_mesh(_ground_mesh(m_ground))
    return settings, res


def test_fused_matches_xla_sss_fallback():
    """SUBSURFACE with sssMode=OFF: the lambert-fallback branch
    (reference pathtrace.metal:5482-5508)."""
    from metal_pathtracer_tpu.settings import SssMode

    settings, res = _sss_scene()
    settings.sssMode = SssMode.OFF
    _compare(settings, res, min_exact=0.95, max_rmse=1e-4)


def test_fused_matches_xla_sss_separable():
    """SUBSURFACE separable normalized-diffusion BSSRDF (sssMode=1):
    exit-point displacement + the BSSRDF next-ray origin biases
    (reference pathtrace.metal:5420-5480, 6741-6766) in the kernel."""
    from metal_pathtracer_tpu.settings import SssMode

    settings, res = _sss_scene(sss_method=0)
    settings.sssMode = SssMode.SEPARABLE
    _compare(settings, res, min_exact=0.93, max_rmse=1e-4)


def test_fused_matches_xla_sss_random_walk():
    """SUBSURFACE volumetric random walk (sssMode=2, method=randomwalk):
    the walk runs as an XLA pre-stage from the kernel's exact RNG fork;
    its planes override walk lanes in S2 (integrator :538-547 twin,
    reference sample_sss_random_walk_software:4060-4310)."""
    from metal_pathtracer_tpu.settings import SssMode

    settings, res = _sss_scene(sss_method=1)
    settings.sssMode = SssMode.RANDOM_WALK
    _compare(settings, res, min_exact=0.93, max_rmse=1e-4)


def test_fused_matches_xla_sss_random_walk_env():
    """Random-walk SSS under env NEE: the pre-stage forks from the
    POST-S1 state (NEE draws consumed first, like the integrator)."""
    from metal_pathtracer_tpu.settings import SssMode

    settings, res = _sss_scene(sss_method=1)
    settings.sssMode = SssMode.RANDOM_WALK
    settings.backgroundMode = BackgroundMode.ENVIRONMENT
    _compare_with_env(settings, res, _toy_env(), min_exact=0.90,
                      max_rmse=1e-4)


def test_fused_matches_xla_plastic_smooth_primary():
    """Near-smooth coat (the chaotic regime above) at depth 1: the
    primary shade through the coat selector must be exact."""
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 1
    settings.fixedRngSeed = 9
    res = SceneResources()
    m_smooth = res.add_material(Material(
        mat_type=C.MATERIAL_PLASTIC, base_color=(0.1, 0.4, 0.7),
        coat_roughness=0.02, ior=1.6))
    m_ground = res.add_material(Material(base_color=(0.6, 0.6, 0.6)))
    res.add_mesh(_sphere_mesh(2, (0.0, 0.6, 0), 0.8, m_smooth, "smooth"))
    res.add_mesh(_ground_mesh(m_ground))
    _compare(settings, res, min_exact=0.999, max_rmse=1e-6)


def test_fused_matches_xla_plastic_env():
    """PLASTIC under HDR env NEE: exercises the S1 lrough export
    (environment_lighting_roughness -> coat roughness) and the eval
    branch in the NEE MIS weights."""
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.6, 0.0)
    settings.cameraDistance = 5.0
    settings.cameraPitch = 0.3
    settings.maxDepth = 3
    settings.fixedRngSeed = 11
    settings.backgroundMode = BackgroundMode.ENVIRONMENT
    res = SceneResources()
    m_p = res.add_material(Material(
        mat_type=C.MATERIAL_PLASTIC, base_color=(0.5, 0.25, 0.1),
        coat_roughness=0.2, coat_thickness=0.2, ior=1.5))
    m_ground = res.add_material(Material(base_color=(0.5, 0.5, 0.5)))
    res.add_mesh(_sphere_mesh(2, (0, 0.6, 0), 0.8, m_p, "p"))
    res.add_mesh(_ground_mesh(m_ground))
    _compare_with_env(settings, res, _toy_env(), min_exact=0.95,
                      max_rmse=1e-4)


def test_fused_matches_xla_many_materials_primary():
    """48 mixed materials, depth 1: every row's type/color/roughness
    reaches the primary shade through the kernel's SMEM select chain —
    a wrong-row fetch flips whole pixels, so this is near-exact.

    (Depth is capped at 1 for the METAL variant deliberately: on a dense
    48-sphere grid, multi-bounce mirror chains amplify the fused kernel's
    documented ~1-ulp FMA drift into hit-order flips that have nothing to
    do with the material fetch — measured rmse 3e-3 at depth 3 with the
    SAME value regardless of which row holds the metal, while XLA-vs-XLA
    at different chunk widths is bit-exact on this scene. The multi-bounce
    fetch path is covered by the lambert variant below.)"""
    settings, res = _many_material_scene(metal=True, max_depth=1)
    _compare(settings, res, min_exact=0.999, max_rmse=1e-6)


def test_fused_matches_xla_many_materials_bounce():
    """48 lambert materials, depth 3: rows >32 fetched on every bounce
    (S1 + S2 stages); diffuse transport keeps drift un-amplified, so the
    established flat tolerance applies."""
    settings, res = _many_material_scene(metal=False, max_depth=3)
    _compare(settings, res, min_exact=0.97, max_rmse=1e-5)


def test_survivor_compaction_invariants():
    """Survivor compaction (MPT_COMPACT_DEPTH/SEG) between depth
    generations must be (a) BIT-invariant to the lane permutation at a
    fixed segment shape, (b) exact on ray/shadow counts and RNG state,
    and (c) within the established fused cross-shape tolerance on
    radiance (XLA re-fuses FMA contractions per program shape — the same
    ulp drift the fused-vs-XLA gates accept; verified pre-existing: four
    4096-lane calls vs one 16384-lane call differ the same way with
    compaction OFF)."""
    import jax
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops import camera as camera_ops
    from metal_pathtracer_tpu.ops import rng as rng_ops
    from metal_pathtracer_tpu.ops.pallas import shade
    from metal_pathtracer_tpu.scene import dsl
    from metal_pathtracer_tpu.scene.meshload import mesh_loader

    settings = RenderSettings()
    res = SceneResources()
    dsl.parse_scene(
        "camera target=0,0,-1 distance=3.5 yaw=0.3 pitch=0.2 vfov=45\n"
        "renderer maxDepth=5 seed=1337\n"
        "background solid=0.6,0.7,1.0\n"
        "material type=lambert albedo=0.8,0.3,0.3\n"
        "material type=metal albedo=0.9,0.8,0.6 roughness=0.1\n"
        "sphere center=0,0,-1 radius=0.5 material=0\n"
        "sphere center=0,-100.5,-1 radius=100 material=1\n",
        settings, res, mesh_loader=mesh_loader)
    res.add_material(Material(base_color=(0.4, 0.6, 0.9)))
    res.add_mesh(dragon_class_scene_mesh(3, material=2))
    w, h = 128, 64  # 8192 lanes: two 4096-lane segments
    scene = res.build_arrays()
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    uni = settings_to_uniforms(settings, build_camera(settings, w, h), 0, 0)
    n = w * h
    x = jnp.arange(n, dtype=jnp.uint32) % w
    y = jnp.arange(n, dtype=jnp.uint32) // w
    seed = rng_ops.make_seed(uni.fixed_rng_seed, uni.frame_index, x, y,
                             uni.sample_count, jnp.zeros(n, jnp.uint32))
    st0, o, d = camera_ops.generate_primary_rays(uni.camera, x, y, w, h,
                                                 seed)

    os.environ["MPT_FUSED_INTERPRET"] = "1"

    def run(compact_depth, identity, key="alive", sched=None):
        os.environ["MPT_COMPACT_DEPTH"] = str(compact_depth)
        os.environ["MPT_COMPACT_SEG"] = "4096"
        os.environ["MPT_COMPACT_IDENTITY"] = "1" if identity else "0"
        os.environ["MPT_COMPACT_KEY"] = key
        if sched is not None:
            os.environ["MPT_COMPACT_SCHEDULE"] = sched
        else:
            os.environ.pop("MPT_COMPACT_SCHEDULE", None)
        jax.clear_caches()
        state, rad, alb, nrm, stats = shade.trace_paths_fused(
            scene, uni, static, st0, o, d)
        return (np.asarray(state), np.asarray(rad), np.asarray(alb),
                np.asarray(nrm), float(stats["rays"]),
                float(stats["shadow_rays"]))

    try:
        base = run(0, False)
        perm = run(2, False)
        ident = run(2, True)
        octm = run(2, False, key="octmorton")
        multi = run(0, False, key="octmorton", sched="1:4096,3:4096")
    finally:
        for k in ("MPT_FUSED_INTERPRET", "MPT_COMPACT_DEPTH",
                  "MPT_COMPACT_SEG", "MPT_COMPACT_IDENTITY",
                  "MPT_COMPACT_KEY", "MPT_COMPACT_SCHEDULE"):
            os.environ.pop(k, None)
        jax.clear_caches()

    # (a) permutation invariance at fixed shape: bit-exact everywhere —
    # including the octant+Morton reorder key (just another permutation)
    for i in range(4):
        np.testing.assert_array_equal(perm[i], ident[i])
        np.testing.assert_array_equal(perm[i], octm[i])
    assert octm[4] == perm[4] and octm[5] == perm[5]
    # (b) counts and RNG state exact vs no compaction
    assert perm[4] == base[4] and perm[5] == base[5]
    np.testing.assert_array_equal(perm[0], base[0])
    np.testing.assert_array_equal(perm[2], base[2])  # AOV albedo
    np.testing.assert_array_equal(perm[3], base[3])  # AOV normal
    # (c) radiance within the fused cross-shape tolerance
    dd = np.abs(perm[1] - base[1])
    rmse = float(np.sqrt((dd * dd).mean()))
    assert rmse < 5e-4, (rmse, float(dd.max()))
    assert float((dd.max(-1) < 1e-4).mean()) > 0.95
    # (d) the multi-point schedule path (two compaction generations)
    # keeps the same invariants: counts/RNG/AOVs exact, radiance in tol
    assert multi[4] == base[4] and multi[5] == base[5]
    np.testing.assert_array_equal(multi[0], base[0])
    np.testing.assert_array_equal(multi[2], base[2])
    np.testing.assert_array_equal(multi[3], base[3])
    dm = np.abs(multi[1] - base[1])
    assert float(np.sqrt((dm * dm).mean())) < 5e-4

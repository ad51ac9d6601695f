"""Fused shade phase-1 on TPU: small parity, then the 1080p lambert bench."""
import os
import time

import numpy as np
import jax

from metal_pathtracer_tpu.ops.camera import build_camera
from metal_pathtracer_tpu.renderer import frame
from metal_pathtracer_tpu.renderer.accumulation import RenderState
from metal_pathtracer_tpu.scene.resources import Material, SceneResources
from metal_pathtracer_tpu.schema import settings_to_static, settings_to_uniforms
from metal_pathtracer_tpu.settings import RenderSettings
from metal_pathtracer_tpu.utils.procgen import dragon_class_scene_mesh


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


settings = RenderSettings()
settings.cameraTarget = (0.0, 0.0, 0.0)
settings.cameraDistance = 3.2
settings.cameraYaw = 0.4
settings.cameraPitch = 0.25
settings.maxDepth = 6
settings.fixedRngSeed = 1234
res = SceneResources()
res.add_material(Material(base_color=(0.7, 0.7, 0.7)))
res.add_mesh(dragon_class_scene_mesh(4, material=0))
scene = res.build_arrays()
w, h = 64, 64
static = settings_to_static(settings, w, h, res.material_types_present())
uni = settings_to_uniforms(settings, build_camera(settings, w, h), 0, 0)


def render_small():
    st = frame.render_samples(scene, uni, RenderState.create(w, h),
                              static, 2)
    return np.asarray(st.present())[..., :3]


log("A: XLA small render")
os.environ["MPT_FUSED_SHADE"] = "0"
t0 = time.time()
img_ref = render_small()
log(f"A done {time.time()-t0:.1f}s")
jax.clear_caches()
log("B: fused small render (Mosaic compile)")
os.environ["MPT_FUSED_SHADE"] = "1"
t0 = time.time()
img_fused = render_small()
log(f"B done {time.time()-t0:.1f}s")
d = np.abs(img_fused - img_ref)
rmse = float(np.sqrt((d * d).mean()))
log(f"PARITY rmse={rmse:.2e} max={float(d.max()):.2e}")

if rmse < 2e-3:
    log("C: 1080p lambert bench, fused")
    bs = RenderSettings()
    bs.cameraTarget = (0.0, 0.0, 0.0)
    bs.cameraDistance = 3.2
    bs.cameraYaw = 0.4
    bs.cameraPitch = 0.25
    bs.cameraVerticalFov = 40.0
    bs.maxDepth = 8
    bs.fixedRngSeed = 1234
    br = SceneResources()
    br.add_material(Material(base_color=(0.7, 0.7, 0.7)))
    br.add_mesh(dragon_class_scene_mesh(7, material=0))
    bscene = br.build_arrays()
    bstatic = settings_to_static(bs, 1920, 1080, br.material_types_present())
    buni = settings_to_uniforms(bs, build_camera(bs, 1920, 1080), 0, 0)

    def rays_of(state):
        return float(np.asarray(state.ray_count)) + \
            float(np.asarray(state.shadow_ray_count))

    state = RenderState.create(1920, 1080)
    t0 = time.time()
    state = frame.render_samples(bscene, buni, state, bstatic, 1)
    _ = rays_of(state)
    log(f"warmup1 {time.time()-t0:.1f}s")
    t0 = time.time()
    state = frame.render_samples(bscene, buni, state, bstatic, 16)
    _ = rays_of(state)
    log(f"warmup16 {time.time()-t0:.1f}s")
    rates = []
    for _ in range(3):
        before = rays_of(state)
        t0 = time.time()
        state = frame.render_samples(bscene, buni, state, bstatic, 16)
        after = rays_of(state)
        rates.append((after - before) / (time.time() - t0) / 1e6)
    rates.sort()
    log(f"FUSED lambert bench: {rates[1]:.2f} Mrays/s "
        f"[{rates[0]:.2f},{rates[2]:.2f}] (xla baseline 12.47)")

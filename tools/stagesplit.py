#!/usr/bin/env python
"""Stage bisection for the bench frame: where does a sample's time go?

Runs the bench scene (procedural dragon-class mesh) at a configurable
resolution and times render_samples under the kernel/sort bisection env
vars (MPT_TRAVERSE_DEBUG). Run via tools/stagesplit.sh to
sweep configurations (env vars are read at import/trace time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState
    from metal_pathtracer_tpu.scene.resources import Material, SceneResources
    from metal_pathtracer_tpu.schema import settings_to_static, settings_to_uniforms
    from metal_pathtracer_tpu.settings import RenderSettings
    from metal_pathtracer_tpu.utils.procgen import dragon_class_scene_mesh

    width = int(os.environ.get("SS_WIDTH", "1920"))
    height = int(os.environ.get("SS_HEIGHT", "1080"))
    spp = int(os.environ.get("SS_SPP", "4"))
    max_depth = int(os.environ.get("SS_DEPTH", "8"))
    label = os.environ.get("SS_LABEL", "full")

    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 3.2
    settings.cameraYaw = 0.4
    settings.cameraPitch = 0.25
    settings.cameraVerticalFov = 40.0
    resources = SceneResources()
    resources.add_material(Material(base_color=(0.7, 0.7, 0.7)))
    resources.add_mesh(dragon_class_scene_mesh(7, material=0))
    settings.maxDepth = max_depth
    settings.fixedRngSeed = 1234

    scene = resources.build_arrays()
    static = settings_to_static(settings, width, height,
                                resources.material_types_present())
    camera = build_camera(settings, width, height)
    uniforms = settings_to_uniforms(settings, camera, 0, 0)

    state = RenderState.create(width, height)
    state = frame.render_samples(scene, uniforms, state, static, 1)
    rays0 = float(np.asarray(state.ray_count))
    _ = np.asarray(state.radiance_sum)

    t0 = time.time()
    state = frame.render_samples(scene, uniforms, state, static, spp)
    rays1 = float(np.asarray(state.ray_count)) + float(
        np.asarray(state.shadow_ray_count))
    _ = np.asarray(state.radiance_sum)
    elapsed = time.time() - t0
    mrays = (rays1 - rays0) / elapsed / 1e6
    print(f"STAGE {label:28s} {elapsed/spp*1000:9.1f} ms/sample  "
          f"{mrays:6.2f} Mrays/s  (spp={spp} {width}x{height} depth={max_depth})",
          flush=True)


if __name__ == "__main__":
    main()

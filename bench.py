#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Metric: Mrays/sec/chip (primary + shadow scene traces) on the standard
benchmark scene at 1080p, per BASELINE.md. The reference publishes no
throughput numbers (BASELINE.json.published = {}); the driver-set target is
200 Mrays/s/chip, used as the vs_baseline denominator.

Scene: the RTOW procedural sphere field (the reference's built-in default
scene, src/MetalRenderer.mm:1997-2126) until the Stanford Dragon asset is
wired in; swaps to the dragon automatically when assets/dragon.obj exists.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    from metal_pathtracer_tpu.utils.compilecache import enable_cache
    enable_cache()
    import jax

    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState
    from metal_pathtracer_tpu.scene.manager import SceneManager, build_procedural_scene
    from metal_pathtracer_tpu.scene.resources import SceneResources
    from metal_pathtracer_tpu.schema import settings_to_static, settings_to_uniforms
    from metal_pathtracer_tpu.settings import RenderSettings

    width, height = 1920, 1080
    warmup_spp, bench_spp, reps = 1, 16, 3

    settings = RenderSettings()
    resources = SceneResources()
    dragon = os.path.join("assets", "models", "dragon.obj")
    if os.path.exists(dragon):
        from metal_pathtracer_tpu.scene import dsl
        text = (
            "camera target=0,0.5,0 distance=2.5 yaw=0.4 pitch=0.2 vfov=35\n"
            "material type=lambert albedo=0.7,0.7,0.7\n"
            f"mesh path={dragon} material=0\n")
        dsl.parse_scene(text, settings, resources,
                        mesh_loader=__import__(
                            "metal_pathtracer_tpu.scene.meshload",
                            fromlist=["mesh_loader"]).mesh_loader)
        scene_name = "dragon"
    else:
        # Stanford-Dragon-class stand-in: displaced icosphere, ~328k tris
        # (no asset downloads in this environment; see utils/procgen.py)
        from metal_pathtracer_tpu.scene.resources import Material
        from metal_pathtracer_tpu.utils.procgen import dragon_class_scene_mesh
        settings.cameraTarget = (0.0, 0.0, 0.0)
        settings.cameraDistance = 3.2
        settings.cameraYaw = 0.4
        settings.cameraPitch = 0.25
        settings.cameraVerticalFov = 40.0
        resources.add_material(Material(base_color=(0.7, 0.7, 0.7)))
        resources.add_mesh(dragon_class_scene_mesh(7, material=0))
        scene_name = "dragon-class-procedural"

    settings.maxDepth = 8
    settings.fixedRngSeed = 1234

    scene = resources.build_arrays()
    static = settings_to_static(settings, width, height,
                                resources.material_types_present())
    camera = build_camera(settings, width, height)
    uniforms = settings_to_uniforms(settings, camera, 0, 0)

    def rays_of(state):
        # np.asarray forces a real host fetch — block_until_ready alone does
        # not reliably round-trip over the axon tunnel (BENCHMARKS.md).
        return float(np.asarray(state.ray_count)) + \
            float(np.asarray(state.shadow_ray_count))

    state = RenderState.create(width, height)
    # Warmup/compile BOTH jit variants: n_samples is a static arg, so a
    # 1-spp warmup alone left the bench_spp compile inside timed rep 0
    # (measured as a 2.6 vs 7.6 Mrays/s first-rep outlier).
    state = frame.render_samples(scene, uniforms, state, static, warmup_spp)
    _ = rays_of(state)
    state = frame.render_samples(scene, uniforms, state, static, bench_spp)
    _ = rays_of(state)

    # Median of `reps` timed repetitions: single-shot numbers on the shared
    # axon tunnel vary +-25% run-to-run (round-1 driver capture vs builder
    # number differed 2.3x — VERDICT r01 weak #3).
    samples = []
    for _rep in range(reps):
        before = rays_of(state)
        t0 = time.time()
        state = frame.render_samples(scene, uniforms, state, static, bench_spp)
        after = rays_of(state)
        elapsed = time.time() - t0
        samples.append(((after - before) / elapsed / 1e6, elapsed))

    rates = sorted(r for r, _ in samples)
    mrays = rates[len(rates) // 2]
    elapsed = sorted(e for _, e in samples)[len(samples) // 2]
    target = 200.0  # BASELINE.md driver-set target, Mrays/s/chip
    result = {
        "metric": f"mrays_per_sec_per_chip_{scene_name}_{width}x{height}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / target, 4),
    }
    print(json.dumps(result))
    print(f"# device={jax.devices()[0].device_kind} spp={bench_spp} x{reps} "
          f"median_elapsed={elapsed:.2f}s "
          f"spread=[{rates[0]:.2f},{rates[-1]:.2f}] Mrays/s "
          f"spp_per_min={60.0 * bench_spp / elapsed:.1f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()

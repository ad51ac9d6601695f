#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Metric: Mrays/sec/chip (primary + shadow scene traces) at 1080p/maxDepth 8,
per BASELINE.md (driver target 200 Mrays/s/chip = the vs_baseline
denominator; the reference publishes no throughput numbers).

Headline scene (utils/benchscene.py): 1.31M-triangle displaced icosphere
(Stanford-Dragon-class; no asset downloads in this environment) + glass
dielectric + textured-PBR sphere on a ground plane under an HDR sun/sky
environment with alias-table NEE — the workload class BASELINE.md names,
not the round-2 lambert-only soft scene. The lambert scene remains as a
secondary series (stderr).

--selfcheck (default on) runs Pallas-vs-XLA parity before timing and
stamps "parity_ok" into the JSON so kernel drift on real hardware is
visible in every BENCH_rN.json (VERDICT r02 weak #6).
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _rays_of(state):
    # np.asarray forces a real host fetch — block_until_ready alone does
    # not reliably round-trip over the axon tunnel (BENCHMARKS.md).
    return float(np.asarray(state.ray_count)) + \
        float(np.asarray(state.shadow_ray_count))


def _median_rate(frame, scene, uniforms, state, static, spp, reps):
    samples = []
    for _ in range(reps):
        before = _rays_of(state)
        t0 = time.time()
        state = frame.render_samples(scene, uniforms, state, static, spp)
        after = _rays_of(state)
        elapsed = time.time() - t0
        samples.append(((after - before) / elapsed / 1e6, elapsed))
    rates = sorted(r for r, _ in samples)
    elapsed = sorted(e for _, e in samples)[len(samples) // 2]
    return rates[len(rates) // 2], elapsed, rates


def _build(settings, resources, environment, width, height):
    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.schema import (
        settings_to_static,
        settings_to_uniforms,
    )

    scene = resources.build_arrays(environment=environment)
    static = settings_to_static(settings, width, height,
                                resources.material_types_present(),
                                resources.texture_slots_present(),
                                resources.texture_uses_uv1())
    camera = build_camera(settings, width, height)
    uniforms = settings_to_uniforms(settings, camera, 0, 0)
    return scene, static, uniforms


def _selfcheck() -> bool:
    """Two-tier Pallas-vs-XLA parity on-chip (runs in-process on whatever
    device bench uses):

    1. STRICT trace parity — the packet traversal kernel vs the jnp
       reference loop must agree bit-for-bit on hits/tri/t/u/v, and the
       any-hit variant on occlusion flags. This is the Mosaic-drift
       detector (VERDICT r02 weak #6): a toolchain regression that
       changes hits fails here hard.
    2. Image parity — a fused-megakernel smoke render vs the all-XLA
       glue path, gated at the tolerance the fused path is tested to
       (tests/test_fused_shade.py: the fused kernel reassociates
       shade-stage arithmetic, so it is rmse~1e-4-exact vs the glue,
       not bit-exact; observed 6.6e-5 on this scene)."""
    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState
    from metal_pathtracer_tpu.scene import dsl
    from metal_pathtracer_tpu.scene.meshload import mesh_loader
    from metal_pathtracer_tpu.scene.resources import SceneResources
    from metal_pathtracer_tpu.schema import (
        settings_to_static,
        settings_to_uniforms,
    )
    from metal_pathtracer_tpu.settings import RenderSettings
    from metal_pathtracer_tpu.utils.procgen import dragon_class_scene_mesh
    from metal_pathtracer_tpu.scene.resources import Material

    # scene with spheres + a real mesh so both packet kernels execute
    settings = RenderSettings()
    res = SceneResources()
    dsl.parse_scene(
        "camera target=0,0,-1 distance=3.5 yaw=0 pitch=0 vfov=45\n"
        "renderer maxDepth=4 seed=1337\n"
        "background solid=0.7,0.8,1.0\n"
        "material type=lambert albedo=0.8,0.3,0.3\n"
        "material type=metal albedo=0.9,0.8,0.6 roughness=0.2\n"
        "sphere center=0,0,-1 radius=0.5 material=0\n"
        "sphere center=0,-100.5,-1 radius=100 material=1\n",
        settings, res, mesh_loader=mesh_loader)
    res.add_material(Material(base_color=(0.4, 0.6, 0.9)))
    res.add_mesh(dragon_class_scene_mesh(3, material=2))

    def render(disable_pallas):
        old = os.environ.get("MPT_DISABLE_PALLAS")
        # NB any non-empty value disables (intersect._use_pallas truthiness)
        if disable_pallas:
            os.environ["MPT_DISABLE_PALLAS"] = "1"
        else:
            os.environ.pop("MPT_DISABLE_PALLAS", None)
        try:
            scene, static, uniforms = _build(settings, res, None, 48, 48)
            st = frame.render_samples(
                scene, uniforms, RenderState.create(48, 48), static, 2)
            return np.asarray(st.present())[..., :3]
        finally:
            if old is None:
                os.environ.pop("MPT_DISABLE_PALLAS", None)
            else:
                os.environ["MPT_DISABLE_PALLAS"] = old

    import jax
    import jax.numpy as jnp

    # ---- tier 1: strict trace parity (bit-exact by design) -------------
    from metal_pathtracer_tpu.ops import traversal
    from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace

    scene, _, _ = _build(settings, res, None, 48, 48)
    rng = np.random.default_rng(7)
    n_probe = 4096
    o = rng.uniform(-3.0, 3.0, (n_probe, 3)).astype(np.float32)
    # aim half the probes at the mesh bounds so most lanes exercise the
    # full traversal depth (uniform directions mostly miss)
    v0 = np.asarray(scene.triangles.v0)
    lo, hi = v0.min(0), v0.max(0)
    target = rng.uniform(lo, hi, (n_probe // 2, 3)).astype(np.float32)
    d = rng.normal(size=(n_probe, 3)).astype(np.float32)
    d[: n_probe // 2] = target - o[: n_probe // 2]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((n_probe,), 1e20, jnp.float32)

    t_p, tri_p, u_p, v_p = packet_trace(o_j, d_j, 1e-3, tmax,
                                        scene.tri_packet)
    _, occ_tri, _, _ = packet_trace(o_j, d_j, 1e-3, tmax, scene.tri_packet,
                                    any_hit=True)
    t_p, tri_p = np.asarray(t_p), np.asarray(tri_p)
    u_p, v_p = np.asarray(u_p), np.asarray(v_p)
    occ_p = np.asarray(occ_tri) >= 0
    os.environ["MPT_DISABLE_PALLAS"] = "1"
    jax.clear_caches()   # env toggle is trace-time; drop compiled fns
    try:
        rec = traversal.trace_triangles(o_j, d_j, scene, 1e-3, tmax)
        hit_r = np.asarray(rec.hit)
        tri_r = np.where(hit_r, np.asarray(rec.prim_index), -1)
        t_r = np.asarray(rec.t)
        uv_r = np.asarray(rec.barycentric)
    finally:
        os.environ.pop("MPT_DISABLE_PALLAS", None)
    jax.clear_caches()
    hit_p = tri_p >= 0
    trace_ok = bool(
        (hit_p == hit_r).all() and (tri_p[hit_p] == tri_r[hit_p]).all()
        and (t_p[hit_p] == t_r[hit_p]).all()
        and (u_p[hit_p] == uv_r[hit_p, 0]).all()
        and (v_p[hit_p] == uv_r[hit_p, 1]).all()
        # any-hit must agree on the occlusion FLAG (which prim is free)
        and (occ_p == hit_r).all())
    print(f"# selfcheck trace_parity bit_exact={trace_ok} "
          f"hits={int(hit_p.sum())}/{n_probe}", file=sys.stderr)

    # ---- tier 2: end-to-end image, fused kernel vs XLA glue ------------
    img_pallas = render(False)
    jax.clear_caches()
    img_ref = render(True)
    jax.clear_caches()
    rmse = float(np.sqrt(np.mean((img_pallas - img_ref) ** 2)))
    maxdiff = float(np.abs(img_pallas - img_ref).max())
    image_ok = (bool(np.isfinite(img_pallas).all())
                and rmse < 5e-4 and maxdiff < 5e-3)
    ok = trace_ok and image_ok
    print(f"# selfcheck rmse={rmse:.2e} maxdiff={maxdiff:.2e} ok={ok}",
          file=sys.stderr)
    return ok


def _arm_watchdog(seconds: int):
    """A hung TPU tunnel otherwise hangs bench forever and the round
    records NOTHING (observed: jax.devices() blocking >10 min after a
    worker swap). A daemon timer thread prints a diagnostic JSON line and
    hard-exits on expiry. (A thread, not SIGALRM: Python signal handlers
    only run between main-thread bytecodes, so they never fire while the
    main thread is parked inside the blocking runtime call — the thread
    runs as soon as that call releases the GIL, which grpc waits do.)"""
    import threading

    def fire():
        print(json.dumps({
            "metric": "bench_watchdog_timeout",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "error": f"no result within {seconds}s "
                     "(TPU tunnel hung or compile stuck)",
        }))
        sys.stdout.flush()
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-selfcheck", action="store_true")
    parser.add_argument("--scene",
                        choices=["dragon", "lambert", "refdefault"],
                        default="dragon")
    parser.add_argument("--spp", type=int, default=16)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--watchdog", type=int, default=int(
        os.environ.get("MPT_BENCH_TIMEOUT", "2700")))
    args = parser.parse_args(argv)

    watchdog = _arm_watchdog(args.watchdog) if args.watchdog > 0 else None

    from metal_pathtracer_tpu.utils.compilecache import enable_cache
    enable_cache()
    import jax

    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState

    width, height = 1920, 1080
    parity_ok = True if args.no_selfcheck else _selfcheck()

    if args.scene == "dragon":
        from metal_pathtracer_tpu.utils.benchscene import build_bench_scene
        settings, resources, environment = build_bench_scene(8)
        scene_name = "dragon-class-hdr-env"
    elif args.scene == "refdefault":
        # The reference's own default workload shape: 1280x720 headless
        # default resolution, maxDepth 20 (README example; settings
        # default 50) — the deep-depth regime where survivor compaction
        # carries the frame (reference: main_headless.mm:39,511-515,
        # RenderSettings.h:41-42). Same bench scene content.
        from metal_pathtracer_tpu.utils.benchscene import build_bench_scene
        settings, resources, environment = build_bench_scene(8)
        settings.maxDepth = 20
        width, height = 1280, 720
        scene_name = "refdefault-720p-depth20"
    else:
        from metal_pathtracer_tpu.scene.resources import (
            Material,
            SceneResources,
        )
        from metal_pathtracer_tpu.settings import RenderSettings
        from metal_pathtracer_tpu.utils.procgen import dragon_class_scene_mesh
        settings = RenderSettings()
        settings.cameraTarget = (0.0, 0.0, 0.0)
        settings.cameraDistance = 3.2
        settings.cameraYaw = 0.4
        settings.cameraPitch = 0.25
        settings.cameraVerticalFov = 40.0
        settings.maxDepth = 8
        settings.fixedRngSeed = 1234
        resources = SceneResources()
        resources.add_material(Material(base_color=(0.7, 0.7, 0.7)))
        resources.add_mesh(dragon_class_scene_mesh(7, material=0))
        environment = None
        scene_name = "dragon-class-procedural"

    scene, static, uniforms = _build(settings, resources, environment,
                                     width, height)

    state = RenderState.create(width, height)
    # Warmup/compile BOTH jit variants: n_samples is a static arg, so a
    # 1-spp warmup alone left the bench-spp compile inside timed rep 0.
    state = frame.render_samples(scene, uniforms, state, static, 1)
    _ = _rays_of(state)
    state = frame.render_samples(scene, uniforms, state, static, args.spp)
    _ = _rays_of(state)

    # Median of reps: single-shot numbers on the shared axon tunnel vary
    # +-25% run-to-run (VERDICT r01 weak #3).
    mrays, elapsed, rates = _median_rate(frame, scene, uniforms, state,
                                         static, args.spp, args.reps)
    target = 200.0  # BASELINE.md driver-set target, Mrays/s/chip
    result = {
        "metric": f"mrays_per_sec_per_chip_{scene_name}_{width}x{height}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / target, 4),
        "parity_ok": parity_ok,
    }
    if watchdog is not None:
        watchdog.cancel()
    print(json.dumps(result))
    print(f"# device={jax.devices()[0].device_kind} spp={args.spp} "
          f"x{args.reps} median_elapsed={elapsed:.2f}s "
          f"spread=[{rates[0]:.2f},{rates[-1]:.2f}] Mrays/s "
          f"spp_per_min={60.0 * args.spp / elapsed:.1f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()

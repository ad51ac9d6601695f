#!/usr/bin/env python
"""Interleaved A/B benchmark harness (the only trustworthy protocol on the
shared axon tunnel: cross-process runs vary 2-3x; same-session interleaved
medians are stable — BENCHMARKS.md).

Benchmarks both full-frame variants (env-flag combinations, traced into
separate jit wrappers) and kernel-only loads (coherent primaries /
synthetic bounce wavefronts against the dragon-class BVH).

Usage:
  python tools/abbench.py frame  MPT_ENV_PACKED=1 MPT_ENV_PACKED=0 ...
  python tools/abbench.py kernel OCT=0 OCT=1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from metal_pathtracer_tpu.utils.compilecache import enable_cache

enable_cache()


def parse_variant(spec):
    env = {}
    last = None
    for kv in spec.split(","):
        if "=" not in kv:
            # comma inside a value (e.g. MPT_COMPACT_SCHEDULE=1:32k,2:8k):
            # append to the previous key's value
            if last is None:
                raise ValueError(f"bad variant token {kv!r} in {spec!r}")
            env[last] += "," + kv
            continue
        k, v = kv.split("=")
        k = {"OCT": "MPT_OCTANT_PASSES",
             "DBG": "MPT_TRAVERSE_DEBUG", "WIDE": "MPT_WIDE",
             "GROUP": "MPT_GROUP", "WWAVE": "MPT_WWAVE"}.get(k, k)
        env[k] = v
        last = k
    return env


def set_env(env):
    for k in ("MPT_OCTANT_PASSES", "MPT_TRAVERSE_DEBUG",
              "MPT_WIDE", "MPT_GROUP", "MPT_WWAVE",
              "MPT_COMPACT_SCHEDULE", "MPT_COMPACT_KEY",
              "MPT_COMPACT_DEPTH", "MPT_COMPACT_SEG", "MPT_STAGE_SKIP",
              "MPT_CHAIN_SKIP", "MPT_MXUVERDICT", "MPT_ENV_TEXEL",
              "MPT_MAX_SPP_PER_DISPATCH", "MPT_TEX_SPARSE",
              "MPT_NODE_BUDGET"):
        os.environ.pop(k, None)
    os.environ.update(env)


def build_bench_scene(width=1920, height=1080, depth=8):
    import pickle

    import jax
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops.camera import build_camera
    from metal_pathtracer_tpu.scene.resources import Material, SceneResources
    from metal_pathtracer_tpu.schema import settings_to_static, settings_to_uniforms
    from metal_pathtracer_tpu.settings import RenderSettings
    from metal_pathtracer_tpu.utils.procgen import dragon_class_scene_mesh

    if os.environ.get("AB_SCENE", "") == "headline":
        # the hardened bench.py headline: 1.31M-tri displaced icosphere +
        # glass dielectric + checker PBR + ground under HDR sun/sky env
        from metal_pathtracer_tpu.utils.benchscene import (
            build_bench_scene as build_headline,
        )
        settings, res, environment = build_headline(8)
        settings.maxDepth = depth
        scene = res.build_arrays(environment=environment)
        static = settings_to_static(settings, width, height,
                                    res.material_types_present(),
                                    res.texture_slots_present(),
                                    res.texture_uses_uv1())
        camera = build_camera(settings, width, height)
        return scene, settings_to_uniforms(settings, camera, 0, 0), static

    cache = ("/tmp/mpt_bench_scene_nb%s.pkl"
             % os.environ.get("MPT_NODE_BUDGET", "default"))
    settings = RenderSettings()
    settings.cameraTarget = (0.0, 0.0, 0.0)
    settings.cameraDistance = 3.2
    settings.cameraYaw = 0.4
    settings.cameraPitch = 0.25
    settings.cameraVerticalFov = 40.0
    settings.maxDepth = depth
    settings.fixedRngSeed = 1234
    material_types = (0,)  # lambert only
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            scene_np = pickle.load(fh)
        scene = jax.tree_util.tree_map(jnp.asarray, scene_np)
    else:
        resources = SceneResources()
        resources.add_material(Material(base_color=(0.7, 0.7, 0.7)))
        resources.add_mesh(dragon_class_scene_mesh(7, material=0))
        scene = resources.build_arrays()
        material_types = resources.material_types_present()
        with open(cache, "wb") as fh:
            pickle.dump(jax.tree_util.tree_map(np.asarray, scene), fh)
    static = settings_to_static(settings, width, height, material_types)
    camera = build_camera(settings, width, height)
    uniforms = settings_to_uniforms(settings, camera, 0, 0)
    return scene, uniforms, static


def bench_frame(variants, spp=None, rounds=None):
    import jax

    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState

    spp = spp or int(os.environ.get("AB_SPP", "2"))
    rounds = rounds or int(os.environ.get("AB_ROUNDS", "3"))

    def _build(depth):
        return build_bench_scene(
            int(os.environ.get("AB_W", "1920")),
            int(os.environ.get("AB_H", "1080")),
            depth=depth)

    # MPT_NODE_BUDGET acts at BVH BUILD time, not trace time: variants
    # that set it get their own scene build (cached per budget value).
    # DEPTH=n is a pseudo-key (like CHUNK): per-variant maxDepth.
    scenes = {}

    def _scene_for(env):
        depth = int(env.pop("DEPTH", os.environ.get("AB_DEPTH", "8")))
        key = (env.get("MPT_NODE_BUDGET", ""), depth)
        if key not in scenes:
            scenes[key] = _build(depth)
        return scenes[key]

    fns = []
    for spec in variants:
        env = parse_variant(spec)
        set_env(env)

        chunk = int(env.pop("CHUNK", os.environ.get("AB_CHUNK", "65536")))
        set_env(env)
        scene, uniforms, static = _scene_for(env)
        width, height = static.width, static.height

        # fresh jit wrapper per variant: env flags are read at trace time
        @jax.jit
        def run(scene, uniforms, state, _spec=spec, _chunk=chunk,
                _static=static):
            return frame.render_rows(scene, uniforms, state, _static, spp,
                                     0, chunk=_chunk)

        state = RenderState.create(width, height)
        t0 = time.time()
        out = run(scene, uniforms, state)
        np.asarray(out.radiance_sum)
        print(f"compile+first {spec}: {time.time()-t0:.1f}s", flush=True)
        fns.append((spec, run, scene, uniforms, (width, height)))

    results = {spec: [] for spec, _, _, _, _ in fns}
    for r in range(rounds):
        for spec, run, scene, uniforms, (width, height) in fns:
            set_env(parse_variant(spec))
            state = RenderState.create(width, height)
            state = run(scene, uniforms, state)  # warm rep (fresh state)
            r0 = float(np.asarray(state.ray_count)) + float(
                np.asarray(state.shadow_ray_count))
            t0 = time.time()
            state = run(scene, uniforms, state)
            r1 = float(np.asarray(state.ray_count)) + float(
                np.asarray(state.shadow_ray_count))
            np.asarray(state.radiance_sum)
            dt = time.time() - t0
            results[spec].append(((r1 - r0) / dt / 1e6, dt))
            print(f"  round {r} {spec}: {dt/spp*1000:.0f} ms/sample "
                  f"{(r1-r0)/dt/1e6:.2f} Mrays/s", flush=True)

    print("\n=== medians ===")
    for spec, vals in results.items():
        rates = sorted(v[0] for v in vals)
        dts = sorted(v[1] for v in vals)
        print(f"{spec:28s} {rates[len(rates)//2]:7.2f} Mrays/s   "
              f"{dts[len(dts)//2]/spp*1000:8.0f} ms/sample")


def make_kernel_loads(scene, static, uniforms):
    """(label, origin, direction) wavefronts: coherent primaries and a
    synthetic diffuse-bounce load (hit points + cosine hemisphere dirs)."""
    import jax
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops import camera as camera_ops
    from metal_pathtracer_tpu.ops import rng as rng_ops

    # full-frame tile order (8x128), matching renderer/frame.py coherence
    from metal_pathtracer_tpu.renderer.frame import _pixel_order
    n = static.width * static.height
    xs, ys, _, _ = _pixel_order(static.height, static.width)
    x = jnp.asarray(xs[:n])
    y = jnp.asarray(ys[:n])
    seed = rng_ops.make_seed(uniforms.fixed_rng_seed, uniforms.frame_index,
                             x, y, uniforms.sample_count,
                             jnp.zeros(n, jnp.uint32))
    state, o, d = camera_ops.generate_primary_rays(
        uniforms.camera, x, y, static.width, static.height, seed)

    # synthetic bounce: random origins on the mesh bbox surface-ish with
    # random unit directions — the measured worst case from round 1
    rng = np.random.default_rng(7)
    bo = rng.random((n, 3)).astype(np.float32) * 2.0 - 1.0
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)

    # REAL bounce load: trace the primaries, bounce lambert-cosine at the
    # hit points (tile-local origins + random hemisphere directions) —
    # what the integrator's depth-1 wavefront actually looks like
    from metal_pathtracer_tpu.ops import intersect
    rec = intersect.trace_scene(o, d, scene, 1e-3, 3.0e38)
    hitm = np.asarray(rec.hit)
    hp = np.asarray(rec.point)
    hn = np.asarray(rec.normal)
    u1 = rng.random(n).astype(np.float32)
    u2 = rng.random(n).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0 = np.cross(hn, np.where(np.abs(hn[:, 0:1]) < 0.9,
                               [1.0, 0, 0], [0, 1.0, 0]))
    t0 /= np.maximum(np.linalg.norm(t0, axis=1, keepdims=True), 1e-9)
    t1 = np.cross(hn, t0)
    bdr = (t0 * (r * np.cos(phi))[:, None] + t1 * (r * np.sin(phi))[:, None]
           + hn * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    # miss lanes: continue past the scene (root slab fails — the real
    # integrator kills them via tmax=0, this is the cheap analogue)
    o_np, d_np = np.asarray(o), np.asarray(d)
    ro = np.where(hitm[:, None], hp + hn * 1e-4, o_np + d_np * 50.0)
    rd = np.where(hitm[:, None], bdr, d_np)
    print(f"bounce-real: {hitm.sum()}/{n} lanes alive", flush=True)

    # REAL shadow load: env-NEE shadow rays from the primary hit points —
    # sun-peaked directions (the headline scene's alias table concentrates
    # ~80% of samples in the sun disc) with a cosine-sky remainder; lanes
    # facing away from the light or missing geometry are dead (tmax=0),
    # matching the integrator's do_shadow gating. any_hit semantics.
    sun = np.array([0.35, 0.8, 0.49], np.float32)
    sun /= np.linalg.norm(sun)
    jit_d = rng.normal(size=(n, 3)).astype(np.float32) * 0.03
    sun_d = sun + jit_d
    sun_d /= np.linalg.norm(sun_d, axis=1, keepdims=True)
    sky_pick = rng.random(n) < 0.2
    sd = np.where(sky_pick[:, None], bdr, sun_d).astype(np.float32)
    ndotl = (hn * sd).sum(1)
    do_sh = hitm & (ndotl > 0.0)
    stmax = np.where(do_sh, 3.0e38, 0.0).astype(np.float32)
    print(f"shadow: {do_sh.sum()}/{n} lanes alive", flush=True)

    # occlusion-heavy variant: the same shadow wavefront with the light
    # BELOW the horizon, so nearly every live lane is occluded by the
    # ground plane / mesh underside — the all-occluded-early-exit win case
    # (a real scenario: interior scenes, area lights behind geometry).
    od = sd * np.array([1.0, -1.0, 1.0], np.float32)
    ondotl = (hn * od).sum(1)
    odo = hitm & (ondotl < 0.0)  # lanes whose hemisphere faces the light
    otmax = np.where(odo, 3.0e38, 0.0).astype(np.float32)
    print(f"shadow-occl: {odo.sum()}/{n} lanes alive", flush=True)

    loads = [("primary", o, d, 3.0e38, False),
             ("bounce-real", jnp.asarray(ro), jnp.asarray(rd), 3.0e38, False),
             ("bounce", jnp.asarray(bo), jnp.asarray(bd), 3.0e38, False),
             ("shadow", jnp.asarray(ro), jnp.asarray(sd),
              jnp.asarray(stmax), True),
             ("shadow-occl", jnp.asarray(ro), jnp.asarray(od),
              jnp.asarray(otmax), True)]
    want = os.environ.get("AB_LOADS", "")
    if want:
        keep = set(want.split(","))
        loads = [l for l in loads if l[0] in keep]
    return loads


def bench_kernel(variants, rounds=3):
    import jax
    import jax.numpy as jnp

    scene, uniforms, static = build_bench_scene()
    loads = make_kernel_loads(scene, static, uniforms)
    bvh = scene.tri_packet

    fns = {}
    for spec in variants:
        set_env(parse_variant(spec))
        from metal_pathtracer_tpu.ops.pallas import traverse

        def make_runs(spec, any_hit):
            @jax.jit
            def run(o, d, tmax, _spec=spec):
                t, tri, u, v = traverse.packet_trace_unsorted(
                    o, d, 1e-3, tmax, bvh, any_hit=any_hit)
                return tri

            # Timing fetches a SCALAR only: np.asarray of the full (N,)
            # result measured ~270ms for 8MB over the tunnel (~35MB/s) — it
            # swamped the kernel and tracked shared-tunnel load, not the
            # kernel.
            @jax.jit
            def run_scalar(o, d, tmax, _spec=spec):
                t, tri, u, v = traverse.packet_trace_unsorted(
                    o, d, 1e-3, tmax, bvh, any_hit=any_hit)
                return jnp.sum(tri)
            return run, run_scalar

        for label, o, d, tmax, any_hit in loads:
            run, run_scalar = make_runs(spec, any_hit)
            t0 = time.time()
            out = run(o, d, tmax)
            hits = int((np.asarray(out) >= 0).sum())
            print(f"compile {spec} {label}: {time.time()-t0:.1f}s "
                  f"hits={hits}/{out.shape[0]}", flush=True)
            np.asarray(run_scalar(o, d, tmax))
            fns[(spec, label)] = (run, run_scalar, o, d, tmax)

    results = {k: [] for k in fns}
    for r in range(rounds):
        for (spec, label), (run, run_scalar, o, d, tmax) in fns.items():
            set_env(parse_variant(spec))
            np.asarray(run_scalar(o, d, tmax))  # warm
            t0 = time.time()
            np.asarray(run_scalar(o, d, tmax))
            dt = time.time() - t0
            results[(spec, label)].append(o.shape[0] / dt / 1e6)
            print(f"  round {r} {spec} {label}: {o.shape[0]/dt/1e6:.2f} Mrays/s",
                  flush=True)

    print("\n=== medians ===")
    for (spec, label), vals in results.items():
        v = sorted(vals)
        print(f"{spec:20s} {label:10s} {v[len(v)//2]:7.2f} Mrays/s")

    # cross-variant result parity (first two variants)
    if len(variants) >= 2:
        for label, o, d, tmax, any_hit in loads:
            set_env(parse_variant(variants[0]))
            a = np.asarray(fns[(variants[0], label)][0](o, d, tmax))
            set_env(parse_variant(variants[1]))
            b = np.asarray(fns[(variants[1], label)][0](o, d, tmax))
            if any_hit:
                # any-hit contract: occlusion BIT parity (which occluding
                # tri is reported is unspecified)
                eq = np.array_equal(a >= 0, b >= 0)
                n_mis = int(((a >= 0) != (b >= 0)).sum())
            else:
                eq = np.array_equal(a, b)
                n_mis = int((a != b).sum())
            print(f"parity {label}: {'BIT-IDENTICAL' if eq else 'DIFFERS '} "
                  f"({n_mis} mismatches)")


if __name__ == "__main__":
    mode = sys.argv[1]
    variants = sys.argv[2:]
    if mode == "frame":
        bench_frame(variants)
    else:
        bench_kernel(variants)

#!/usr/bin/env python
"""Glue profiler: time integrator stages in isolation at chunk width.

With the traversal kernel stubbed, a full sample still costs ~1.4s at 2M
lanes (tools/abbench.py frame DBG=all) — this pins down which stage.
Each stage is timed as K chained reps inside ONE jit (axon dispatch is
~40ms/call).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.abbench import build_bench_scene


def timeit(name, fn, *args, k=8, reps=3):
    import jax
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        ts.append(time.time() - t0)
    per = (min(ts) - 0.04) / k
    print(f"{name:44s} {per*1e3:8.2f} ms/rep (x32 chunks = "
          f"{per*32*1e3:7.0f} ms/sample-equivalent)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops import camera as camera_ops
    from metal_pathtracer_tpu.ops import bsdf as bsdf_ops
    from metal_pathtracer_tpu.ops import intersect, rng as rng_ops
    from metal_pathtracer_tpu.ops.integrator import trace_paths
    from metal_pathtracer_tpu.ops import traversal

    scene, uniforms, static = build_bench_scene()
    N = 1 << 16
    rng = np.random.default_rng(0)

    from metal_pathtracer_tpu.renderer.frame import _pixel_order
    xs, ys, _, _ = _pixel_order(512, 128)
    x = jnp.asarray(xs[:N])
    y = jnp.asarray(ys[:N])
    seed = rng_ops.make_seed(uniforms.fixed_rng_seed, uniforms.frame_index,
                             x, y, uniforms.sample_count,
                             jnp.zeros(N, jnp.uint32))
    state, o, d = camera_ops.generate_primary_rays(
        uniforms.camera, x, y, static.width, static.height, seed)
    o = jax.block_until_ready(o)

    def chain(f, k=8):
        def g(o, d, s):
            def body(i, carry):
                o, s = carry
                r = f(o, d, s)
                return o + r * 1e-12, s
            out, _ = jax.lax.fori_loop(0, k, body, (o, s))
            return jnp.sum(out)  # scalar fetch: tunnel is ~35MB/s
        return jax.jit(g)

    # 1. full trace_scene (kernel + record construction)
    def f_trace(o, d, s):
        rec = intersect.trace_scene(o, d, scene, 1e-3, 3.0e38)
        return rec.point + rec.normal
    timeit("trace_scene (kernel + rec)", chain(f_trace), o, d, state)

    # 2. record construction only (synthetic kernel outputs)
    t_syn = jnp.full((N,), 2.0, jnp.float32)
    tri_syn = jnp.asarray(rng.integers(0, scene.triangles.count, N), jnp.int32)
    u_syn = jnp.full((N,), 0.3, jnp.float32)

    def f_rec(o, d, s):
        rec = traversal._hit_record_from_best(o, d, scene.triangles,
                                              t_syn, tri_syn, u_syn, u_syn)
        return rec.point + rec.shading_normal
    timeit("hit-record gathers+interp", chain(f_rec), o, d, state)

    # 3. camera + seed
    def f_cam(o, d, s):
        s2, oo, dd = camera_ops.generate_primary_rays(
            uniforms.camera, x, y, static.width, static.height, s)
        return oo + dd
    timeit("camera+rng raygen", chain(f_cam), o, d, state)

    # 4. lambert eval+sample (material broadcast + bsdf)
    m = bsdf_ops.gather_material(scene.materials,
                                 jnp.zeros((N,), jnp.int32))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    clamp_p = bsdf_ops.make_clamp_params(uniforms)

    def f_bsdf(o, d, s):
        st, smp = bsdf_ops.sample_bsdf(
            m, o, nrm, -d, d, jnp.ones((N,), bool), s, clamp_p,
            static.sss_mode, jnp.ones((N,), jnp.float32), False,
            static.material_types)
        return smp.direction * smp.pdf[..., None]
    timeit("sample_bsdf lambert", chain(f_bsdf), o, d, state)

    # 5. one full integrator bounce-loop at chunk width
    def f_integrate(o, d, s):
        _, radiance, _, _, _ = trace_paths(scene, uniforms, static, s, o, d)
        return radiance
    timeit("trace_paths full (while-loop)", chain(f_integrate, k=2), o, d,
           state, k=2)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def main_2m():
    """Scale check: the same stages at 2M lanes (full-frame width)."""
    import jax
    import jax.numpy as jnp

    from metal_pathtracer_tpu.ops import camera as camera_ops
    from metal_pathtracer_tpu.ops import intersect, rng as rng_ops
    from metal_pathtracer_tpu.ops.integrator import trace_paths
    from metal_pathtracer_tpu.renderer.frame import _pixel_order

    scene, uniforms, static = build_bench_scene()
    N = 1920 * 1080
    xs, ys, _, _ = _pixel_order(1080, 1920)
    x = jnp.asarray(xs[:N])
    y = jnp.asarray(ys[:N])
    seed = rng_ops.make_seed(uniforms.fixed_rng_seed, uniforms.frame_index,
                             x, y, uniforms.sample_count,
                             jnp.zeros(N, jnp.uint32))
    state, o, d = camera_ops.generate_primary_rays(
        uniforms.camera, x, y, static.width, static.height, seed)
    o = jax.block_until_ready(o)

    def chain(f, k):
        def g(o, d, s):
            def body(i, carry):
                o, s = carry
                r = f(o, d, s)
                return o + r * 1e-12, s
            out, _ = jax.lax.fori_loop(0, k, body, (o, s))
            return jnp.sum(out)  # scalar fetch: tunnel is ~35MB/s
        return jax.jit(g)

    def f_trace(o, d, s):
        rec = intersect.trace_scene(o, d, scene, 1e-3, 3.0e38)
        return rec.point + rec.normal
    timeit("2M trace_scene (kernel + rec)", chain(f_trace, 2), o, d, state,
           k=2)

    def f_integrate(o, d, s):
        _, radiance, _, _, _ = trace_paths(scene, uniforms, static, s, o, d)
        return radiance
    timeit("2M trace_paths full", chain(f_integrate, 2), o, d, state, k=2)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2m":
    main_2m()

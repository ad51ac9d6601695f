"""Re-measure MPT_MAX_SPP_PER_DISPATCH on the current runtime (VERDICT
r04 weak #7): the =2 default worked around a 2026-08-17 tunnel-worker
fault on sample-loop trip counts >= 4; if the current worker handles
larger dispatches, raising the default amortizes the ~40 ms dispatch
floor for free (bit-exact either way — accumulation seeds from running
sums).

Interleaved same-process timing over the HEADLINE scene at 8 spp:

    python tools/sppdispatch.py [spp] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from metal_pathtracer_tpu.utils.compilecache import enable_cache

enable_cache()


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["AB_SCENE"] = "headline"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from abbench import build_bench_scene

    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState

    scene, uniforms, static = build_bench_scene(
        int(os.environ.get("AB_W", "1920")),
        int(os.environ.get("AB_H", "1080")),
        depth=int(os.environ.get("AB_DEPTH", "8")))
    w, h = static.width, static.height

    variants = [v for v in (sys.argv[3:] or ["1", "2", "4", "8"])]
    sums = {}
    # compile first (each dispatch size is its own executable)
    for v in variants:
        os.environ["MPT_MAX_SPP_PER_DISPATCH"] = v
        t0 = time.time()
        st = frame.render_samples(scene, uniforms, RenderState.create(w, h),
                                  static, spp)
        sums[v] = float(np.asarray(st.radiance_sum).sum())
        print(f"compile+first dispatch={v}: {time.time() - t0:.1f}s",
              flush=True)

    # bit-exactness across dispatch sizes (same float addition sequence)
    base = sums[variants[0]]
    for v, s in sums.items():
        tag = "EXACT" if s == base else f"DIFFERS ({s} vs {base})"
        print(f"radiance_sum dispatch={v}: {tag}", flush=True)

    results = {v: [] for v in variants}
    for r in range(rounds):
        for v in variants:
            os.environ["MPT_MAX_SPP_PER_DISPATCH"] = v
            st = RenderState.create(w, h)
            t0 = time.time()
            st = frame.render_samples(scene, uniforms, st, static, spp)
            rays = float(np.asarray(st.ray_count)) + float(
                np.asarray(st.shadow_ray_count))
            dt = time.time() - t0
            results[v].append((rays / dt / 1e6, dt))
            print(f"  round {r} dispatch={v}: {dt / spp * 1000:.0f} "
                  f"ms/sample {rays / dt / 1e6:.2f} Mrays/s", flush=True)

    print("\n=== medians ===")
    for v, vals in results.items():
        rates = sorted(x[0] for x in vals)
        dts = sorted(x[1] for x in vals)
        print(f"dispatch={v:3s} {rates[len(rates) // 2]:7.2f} Mrays/s   "
              f"{dts[len(dts) // 2] / spp * 1000:8.0f} ms/sample")


if __name__ == "__main__":
    main()

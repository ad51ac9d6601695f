#!/usr/bin/env python
"""Per-sample closest vs shadow ray split on the headline scene, for the
BENCHMARKS round-5 budget table (the bench headline only prints the sum).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from metal_pathtracer_tpu.utils.compilecache import enable_cache

enable_cache()


def main():
    from metal_pathtracer_tpu.renderer import frame
    from metal_pathtracer_tpu.renderer.accumulation import RenderState
    from tools.abbench import build_bench_scene

    os.environ["AB_SCENE"] = "headline"
    spp = int(os.environ.get("AB_SPP", "2"))
    scene, uniforms, static = build_bench_scene(1920, 1080, depth=8)
    state = RenderState.create(static.width, static.height)
    state = frame.render_samples(scene, uniforms, state, static, spp)
    closest = float(np.asarray(state.ray_count)) / spp
    shadow = float(np.asarray(state.shadow_ray_count)) / spp
    lanes = static.width * static.height
    print(f"closest {closest/1e6:.3f}M/sample ({closest/lanes:.3f}/pixel)  "
          f"shadow {shadow/1e6:.3f}M/sample ({shadow/lanes:.3f}/pixel)  "
          f"total {(closest+shadow)/1e6:.3f}M/sample")


if __name__ == "__main__":
    main()

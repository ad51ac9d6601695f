"""Headless rendering backends.

Protocol + implementations mirroring the reference's headless layer
(reference: include/headless/IHeadlessRenderer.h:12-52,
src/headless/MetalHeadlessRenderer.mm:10-117):

- `TpuBackend` — the product path: jitted sample batches on the TPU
  (the analogue of MetalHeadlessRenderer driving the Metal facade).
- `CpuJaxBackend` — the same integrator forced onto jax-CPU; a smoke-level
  cross-check (the full independent C++ oracle lives in native/).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from metal_pathtracer_tpu.ops.camera import build_camera
from metal_pathtracer_tpu.renderer import frame
from metal_pathtracer_tpu.renderer.accumulation import RenderState
from metal_pathtracer_tpu.schema import settings_to_static, settings_to_uniforms
from metal_pathtracer_tpu.settings import BackgroundMode, RenderSettings


@dataclasses.dataclass
class HeadlessRenderOutput:
    """(reference: IHeadlessRenderer.h HeadlessRenderOutput:30-40)"""

    linear_rgb: np.ndarray       # (H,W,3) f32
    width: int
    height: int
    samples: int
    total_seconds: float
    avg_ms_per_sample: float
    albedo: Optional[np.ndarray] = None
    normal: Optional[np.ndarray] = None
    sample_count: Optional[np.ndarray] = None


# Samples encoded per jitted step (the reference batches <=16 spp per
# command buffer, MetalHeadlessRenderer.mm:48).
DEFAULT_BATCH = 16


class TpuBackend:
    """Progressive batch renderer on the default JAX device."""

    name = "tpu"

    def render(self, resources, settings: RenderSettings, width: int, height: int,
               spp_total: int, verbose: bool = False,
               progress_interval: float = 0.5,
               batch: int = DEFAULT_BATCH,
               mesh_parallel=None) -> HeadlessRenderOutput:
        import jax

        environment = None
        if settings.backgroundMode == BackgroundMode.ENVIRONMENT \
                and settings.environmentMapPath:
            from metal_pathtracer_tpu.ops import env as env_ops
            environment = env_ops.load_environment(settings.environmentMapPath)

        scene = resources.build_arrays(environment=environment)
        static = settings_to_static(settings, width, height,
                                    resources.material_types_present())
        camera = build_camera(settings, width, height)
        state = RenderState.create(width, height)

        start = time.time()
        last_report = start
        done = 0
        while done < spp_total:
            n = min(batch, spp_total - done)
            uniforms = settings_to_uniforms(settings, camera, 0, 0)
            state = frame.render_samples(scene, uniforms, state, static, n)
            done += n
            if verbose:
                now = time.time()
                if now - last_report >= progress_interval or done >= spp_total:
                    state.radiance_sum.block_until_ready()
                    elapsed = time.time() - start
                    print(f"[Headless] {done}/{spp_total} spp "
                          f"({elapsed:.1f}s, {1000.0 * elapsed / max(done, 1):.1f} ms/sample)")
                    last_report = now

        state.radiance_sum.block_until_ready()
        total = time.time() - start
        img = np.asarray(state.present())
        return HeadlessRenderOutput(
            linear_rgb=img, width=width, height=height, samples=done,
            total_seconds=total,
            avg_ms_per_sample=1000.0 * total / max(done, 1),
            albedo=np.asarray(state.albedo),
            normal=np.asarray(state.normal * 0.5 + 0.5),
            sample_count=np.asarray(state.sample_count),
        )


class CpuJaxBackend(TpuBackend):
    """Same integrator pinned to jax-CPU — a quick cross-device check.

    The reference's independent CPU oracle (EmbreeHeadlessRenderer.mm) maps
    to native/cpu_oracle in this framework; this backend is the cheap
    device-parity probe (TPU vs CPU must agree bit-for-bit modulo libm).
    """

    name = "cpu-jax"

    def render(self, *args, **kwargs):
        import jax

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return super().render(*args, **kwargs)


def make_backend(name: str):
    """(reference: main_headless.mm --backend=metal|embree)"""
    if name in ("tpu", "metal"):  # accept the reference's flag value
        return TpuBackend()
    if name in ("cpu", "cpu-jax", "embree"):
        return CpuJaxBackend()
    raise ValueError(f"unknown backend: {name}")

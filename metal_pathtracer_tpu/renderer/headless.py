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


def _scene_digest(scene, static, uniforms) -> str:
    """sha256 over the static config + uniforms + scene arrays: identifies
    what a checkpointed accumulation was rendered with."""
    import hashlib

    import jax

    h = hashlib.sha256()
    h.update(repr(static).encode())
    for leaf in jax.tree_util.tree_leaves(uniforms):
        h.update(np.asarray(leaf).tobytes())
    for leaf in jax.tree_util.tree_leaves(scene):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


class TpuBackend:
    """Progressive batch renderer on the default JAX device."""

    name = "tpu"

    def render(self, resources, settings: RenderSettings, width: int, height: int,
               spp_total: int, verbose: bool = False,
               progress_interval: float = 0.5,
               batch: int = DEFAULT_BATCH,
               checkpoint_path: str = "",
               mesh_parallel=None, **_kwargs) -> HeadlessRenderOutput:
        import os

        import jax

        environment = None
        if settings.backgroundMode == BackgroundMode.ENVIRONMENT \
                and settings.environmentMapPath:
            from metal_pathtracer_tpu.ops import env as env_ops
            environment = env_ops.load_environment(settings.environmentMapPath)

        scene = resources.build_arrays(environment=environment)
        static = settings_to_static(settings, width, height,
                                    resources.material_types_present(),
                                    resources.texture_slots_present(),
                                    resources.texture_uses_uv1())
        camera = build_camera(settings, width, height)
        # Render-state checkpoint/resume (capability the reference lacks,
        # SURVEY.md §5.4): a checkpointed accumulation continues exactly
        # where it stopped (deterministic via the per-sample seed recipe).
        # The digest ties the checkpoint to this (scene, settings) so a
        # resume can never blend unrelated accumulations (ADVICE r01).
        digest = ""
        if checkpoint_path:
            digest = _scene_digest(scene, static,
                                   settings_to_uniforms(settings, camera, 0, 0))
        if checkpoint_path and os.path.exists(checkpoint_path):
            state = RenderState.load(checkpoint_path, expect_digest=digest,
                                     expect_size=(width, height))
            if verbose:
                done0 = int(np.asarray(state.frame_index))
                print(f"[Headless] resumed {done0} spp from {checkpoint_path}")
        else:
            state = RenderState.create(width, height)

        from metal_pathtracer_tpu.utils import stats as stats_mod

        perf = stats_mod.PerformanceStats()
        # counters restored from a checkpoint are history, not this run's work
        perf.total_rays = float(np.asarray(state.ray_count))
        perf.total_shadow_rays = float(np.asarray(state.shadow_ray_count))
        log = stats_mod.get_logger("Headless")
        stats_mod.set_verbose(verbose)

        start = time.time()
        last_report = start
        last_ckpt = start
        done = int(np.asarray(state.frame_index))
        while done < spp_total:
            n = min(batch, spp_total - done)
            uniforms = settings_to_uniforms(settings, camera, 0, 0)
            with stats_mod.BatchTimer() as bt:
                state = frame.render_samples(scene, uniforms, state, static, n)
                if verbose:
                    state.radiance_sum.block_until_ready()
            done += n
            # Periodic saves so an interrupted run resumes from the last
            # completed batch, not from nothing (ADVICE r01).
            if checkpoint_path and done < spp_total \
                    and time.time() - last_ckpt >= 30.0:
                state.save(checkpoint_path, digest=digest)
                last_ckpt = time.time()
            if verbose:
                perf.update(
                    samples=n, seconds=bt.seconds, width=width, height=height,
                    ray_count=float(np.asarray(state.ray_count)),
                    shadow_ray_count=float(np.asarray(state.shadow_ray_count)))
                now = time.time()
                if now - last_report >= progress_interval or done >= spp_total:
                    log.info(f"{done}/{spp_total} spp — {perf.summary()}")
                    last_report = now

        state.radiance_sum.block_until_ready()
        total = time.time() - start
        self.last_stats = perf
        if checkpoint_path:
            state.save(checkpoint_path, digest=digest)
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
    """Same integrator pinned to jax-CPU — a quick cross-device check."""

    name = "cpu-jax"

    def render(self, *args, **kwargs):
        import jax

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return super().render(*args, **kwargs)


class OracleBackend:
    """The native C++ CPU oracle — the parity reference backend, playing
    the reference's `--backend=embree` role
    (reference: src/headless/EmbreeHeadlessRenderer.mm)."""

    name = "oracle"

    def render(self, resources, settings: RenderSettings, width: int,
               height: int, spp_total: int, verbose: bool = False,
               n_threads: int = 0, **_kwargs) -> HeadlessRenderOutput:
        from metal_pathtracer_tpu.renderer import oracle

        if _kwargs.get("checkpoint_path"):
            print("[Oracle] warning: --checkpoint is not supported by the "
                  "CPU oracle backend; rendering from scratch")

        environment = None
        if settings.backgroundMode == BackgroundMode.ENVIRONMENT \
                and settings.environmentMapPath:
            from metal_pathtracer_tpu.ops import env as env_ops
            environment = env_ops.load_environment(settings.environmentMapPath,
                                                   to_device=False)

        start = time.time()
        img = oracle.render_oracle(resources, settings, width, height,
                                   spp_total, environment=environment,
                                   n_threads=n_threads)
        total = time.time() - start
        if verbose:
            print(f"[Oracle] {spp_total} spp in {total:.1f}s")
        return HeadlessRenderOutput(
            linear_rgb=img, width=width, height=height, samples=spp_total,
            total_seconds=total,
            avg_ms_per_sample=1000.0 * total / max(spp_total, 1))


def make_backend(name: str):
    """(reference: main_headless.mm --backend=metal|embree)"""
    if name in ("tpu", "metal"):  # accept the reference's flag value
        # Failure fallback (SURVEY §5.4; the reference's HWRT->SWRT
        # graceful degrade, SceneAccel.mm:628-649): if the accelerator
        # runtime cannot initialize (libtpu mismatch, no device, stale
        # tunnel), degrade to the jax-CPU backend with a visible warning
        # instead of dying at first trace.
        jax = None
        try:
            import jax
            jax.devices()
        except Exception as exc:  # noqa: BLE001 — any init failure
            import sys
            print("[Headless] warning: accelerator backend failed to "
                  f"initialize ({type(exc).__name__}: {exc}); falling "
                  "back to the jax-CPU backend", file=sys.stderr)
            if jax is None:  # the import itself failed: nothing to degrade to
                raise
            jax.config.update("jax_platforms", "cpu")
            return CpuJaxBackend()
        return TpuBackend()
    if name in ("cpu", "oracle", "embree"):
        from metal_pathtracer_tpu.renderer import oracle
        if oracle.oracle_available():
            return OracleBackend()
        # Never silently swap renderers under the user (ADVICE r01): the
        # oracle is the parity reference; the jax-CPU path is not it.
        import sys
        print(f"[Headless] warning: backend {name!r} requested but the "
              "native CPU oracle is unavailable (build it with "
              "native/build.sh); falling back to the jax-CPU backend",
              file=sys.stderr)
        return CpuJaxBackend()
    if name == "cpu-jax":
        return CpuJaxBackend()
    raise ValueError(f"unknown backend: {name}")

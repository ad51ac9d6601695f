"""Jitted frame stepping: N samples of progressive accumulation.

The TPU analogue of the reference's encodeFrame/encodeIntegration per-sample
dispatch loop (reference: src/renderer/RenderLoop.mm:367-391): a single
jitted function advances the RenderState by `n_samples`, with the pixel
wavefront processed in fixed-size chunks (bounds the lanes x primitives
working set in HBM, the way the GPU bounds it by dispatch width).

`render_rows` is the shard-local core: it renders a horizontal slab at a
given global row offset, which is how parallel/mesh.py maps the image
across a device mesh while keeping images bit-identical to single-chip
(RNG is seeded by absolute pixel id).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from metal_pathtracer_tpu.ops import integrator
from metal_pathtracer_tpu.renderer.accumulation import RenderState
from metal_pathtracer_tpu.schema import SceneArrays, StaticConfig, Uniforms

# Lanes per chunk; chosen so brute-force (lanes x prims) buffers stay well
# under HBM while keeping the VPU saturated.
DEFAULT_CHUNK = 262144  # lanes per integrator chunk: A/B'd 64K/128K/256K/512K/2M
# on-chip — 256K minimizes (64K pays ~12ms/chunk fixed cost x32, full-frame
# loses per-chunk early exit; 771/842/403/418/451 ms per 1080p sample)

# Pixel tile matched to the packet kernel's ray blocks: 8 rows x 128 cols
# = 1024 pixels = one traversal packet (ops/pallas/traverse.py). Tile
# order gives packets 2D image coherence, which is what bounds the
# shared-stack traversal's node/chunk visit count.
TILE_H, TILE_W = 8, 128


def _pixel_order(slab_h: int, width: int):
    """Flat lane -> pixel mapping in tile order (scan order fallback).

    Returns (x_lanes, y_lanes, inverse_perm) as numpy arrays; inverse_perm
    scatters lane results back to scan-order pixels:
    img_flat = lanes[inverse_perm].
    """
    total = slab_h * width
    if slab_h % TILE_H == 0 and width % TILE_W == 0:
        ty, tx = np.meshgrid(np.arange(slab_h // TILE_H),
                             np.arange(width // TILE_W), indexing="ij")
        py, px = np.meshgrid(np.arange(TILE_H), np.arange(TILE_W),
                             indexing="ij")
        # lanes ordered tile-by-tile, row-major within the tile
        y = (ty.reshape(-1, 1) * TILE_H + py.reshape(1, -1)).reshape(-1)
        x = (tx.reshape(-1, 1) * TILE_W + px.reshape(1, -1)).reshape(-1)
    else:
        flat = np.arange(total)
        x = flat % width
        y = flat // width
    perm = y * width + x                      # lane -> pixel
    inverse = np.empty(total, np.int64)
    inverse[perm] = np.arange(total)          # pixel -> lane
    return x.astype(np.uint32), y.astype(np.uint32), inverse


def render_rows(scene: SceneArrays, uniforms: Uniforms, state: RenderState,
                static: StaticConfig, n_samples: int, row_offset,
                chunk: int = DEFAULT_CHUNK) -> RenderState:
    """Advance a slab of rows by n_samples. `state` covers the slab; pixel
    coordinates are global (slab row 0 is image row `row_offset`), so the
    result is invariant to how the image is sliced across devices."""
    if n_samples <= 0:
        return state
    slab_h, width = state.height, state.width
    total = slab_h * width
    chunk = min(chunk, total)
    padded = ((total + chunk - 1) // chunk) * chunk
    x_np, y_np, inverse_np = _pixel_order(slab_h, width)
    if padded > total:
        # padding lanes redo the last pixel; sliced off before scatter
        x_np = np.concatenate([x_np, np.full(padded - total, x_np[-1])])
        y_np = np.concatenate([y_np, np.full(padded - total, y_np[-1])])
    xs = jnp.asarray(x_np.astype(np.uint32)).reshape(-1, chunk)
    ys_local = jnp.asarray(y_np.astype(np.uint32)).reshape(-1, chunk)
    inverse_perm = jnp.asarray(inverse_np)
    n_chunks = xs.shape[0]

    # Per-lane prev counts and running radiance, fetched ONCE per call
    # (gathers measured ~15ns/element on this TPU — per-sample perm/unperm
    # gathers were a large fixed cost at 2M lanes; see
    # tools/microbench_gather2.py). Seeding the lane accumulator from the
    # existing sum keeps the per-pixel float addition sequence identical
    # to per-sample accumulation, so checkpoint resume stays bit-exact.
    lane_idx = jnp.minimum(
        jnp.asarray(y_np.astype(np.int64) * width + x_np.astype(np.int64)),
        total - 1)
    prev_lane0 = state.sample_count.reshape(-1)[lane_idx].reshape(-1, chunk)
    lane_rad0 = state.radiance_sum.reshape(-1, 3)[lane_idx]

    def one_sample(i, carry):
        # Per-dispatch uniforms: frameIndex == sampleCount == dispatch index
        # (reference: Accumulation.h incrementFrame:54-57, UniformBuilder.mm:31-33).
        lane_rad, lane_alb, lane_nrm, frame_idx, n_rays, n_shadow = carry
        u = uniforms.replace(frame_index=frame_idx, sample_count=frame_idx)

        def do_chunk(coords):
            x, y_local, prev = coords
            y = y_local + jnp.uint32(row_offset)
            return integrator.integrate_pixels(scene, u, static, x, y,
                                               prev + i.astype(jnp.uint32))

        if n_chunks == 1:
            sample, albedo, normal, stats = do_chunk(
                (xs[0], ys_local[0], prev_lane0[0]))
            sample, albedo, normal = sample[None], albedo[None], normal[None]
            stats = jax.tree_util.tree_map(lambda v: v[None], stats)
        else:
            sample, albedo, normal, stats = jax.lax.map(
                do_chunk, (xs, ys_local, prev_lane0))

        return (lane_rad + sample.reshape(-1, 3),
                albedo.reshape(-1, 3), normal.reshape(-1, 3),
                frame_idx + jnp.uint32(1),
                n_rays + jnp.sum(stats["rays"]),
                n_shadow + jnp.sum(stats["shadow_rays"]))

    z_lane = jnp.zeros((padded, 3), jnp.float32)
    lane_rad, lane_alb, lane_nrm, frame_idx, n_rays, n_shadow = \
        jax.lax.fori_loop(
            0, n_samples, one_sample,
            (lane_rad0, z_lane, z_lane, state.frame_index,
             state.ray_count, state.shadow_ray_count))

    # Lanes are in tile order; the static inverse permutation restores
    # scan-order pixels ONCE per call (a pure gather — no duplicate writes).
    def unperm(v):
        return v[:total][inverse_perm].reshape(slab_h, width, 3)

    return state.replace(
        radiance_sum=unperm(lane_rad),
        sample_count=state.sample_count + jnp.uint32(n_samples),
        albedo=unperm(lane_alb),
        normal=unperm(lane_nrm),
        frame_index=frame_idx,
        ray_count=n_rays,
        shadow_ray_count=n_shadow,
    )


@functools.partial(jax.jit, static_argnames=("static", "n_samples", "chunk"))
def _render_samples_jit(scene: SceneArrays, uniforms: Uniforms,
                        state: RenderState, static: StaticConfig,
                        n_samples: int,
                        chunk: int = DEFAULT_CHUNK) -> RenderState:
    return render_rows(scene, uniforms, state, static, n_samples, 0, chunk)


# Samples per device dispatch. The 2026-08-17 axon tunnel worker faults
# ("TPU worker process crashed") on frame programs whose outer sample loop
# has trip count >= 4 over 2M-lane bodies — freshly compiled, any shade
# path, stubbed or real traversal; trip counts 1-2 and 56x-chained 256K
# bodies in one jit are fine, so it is not duration or body size. Until
# the runtime is fixed, split multi-spp renders into <=2-spp dispatches:
# per-lane accumulation is seeded from the running sums, so the split is
# bit-exact vs a single dispatch (same float addition sequence), costing
# only ~40 ms dispatch overhead per extra call.
MAX_SPP_PER_DISPATCH = int(os.environ.get("MPT_MAX_SPP_PER_DISPATCH", "2"))


def render_samples(scene: SceneArrays, uniforms: Uniforms, state: RenderState,
                   static: StaticConfig, n_samples: int,
                   chunk: int = DEFAULT_CHUNK) -> RenderState:
    """Single-device: advance the full frame by n_samples.

    Host-side wrapper over the jitted step; dispatches at most
    MAX_SPP_PER_DISPATCH samples per device program (see note above).
    """
    step = max(1, MAX_SPP_PER_DISPATCH)
    while n_samples > 0:
        take = min(step, n_samples)
        state = _render_samples_jit(scene, uniforms, state, static, take,
                                    chunk)
        n_samples -= take
    return state

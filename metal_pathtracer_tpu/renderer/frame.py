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

import jax
import jax.numpy as jnp
import numpy as np

from metal_pathtracer_tpu.ops import integrator
from metal_pathtracer_tpu.renderer.accumulation import RenderState
from metal_pathtracer_tpu.schema import SceneArrays, StaticConfig, Uniforms

# Lanes per chunk; chosen so brute-force (lanes x prims) buffers stay well
# under HBM while keeping the VPU saturated.
DEFAULT_CHUNK = 1 << 16

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

    def one_sample(_, st: RenderState) -> RenderState:
        # Per-dispatch uniforms: frameIndex == sampleCount == dispatch index
        # (reference: Accumulation.h incrementFrame:54-57, UniformBuilder.mm:31-33).
        u = uniforms.replace(frame_index=st.frame_index,
                             sample_count=st.frame_index)
        prev_count_flat = st.sample_count.reshape(-1)

        def do_chunk(coords):
            x, y_local = coords
            prev = prev_count_flat[jnp.minimum(y_local * width + x, total - 1)]
            y = y_local + jnp.uint32(row_offset)
            return integrator.integrate_pixels(scene, u, static, x, y, prev)

        if n_chunks == 1:
            sample, albedo, normal, stats = do_chunk((xs[0], ys_local[0]))
            sample, albedo, normal = sample[None], albedo[None], normal[None]
            stats = jax.tree_util.tree_map(lambda v: v[None], stats)
        else:
            sample, albedo, normal, stats = jax.lax.map(
                do_chunk, (xs, ys_local))

        # Lanes are in tile order; the static inverse permutation restores
        # scan-order pixels (a pure gather — no duplicate writes).
        def unperm(v):
            return v.reshape(-1, 3)[:total][inverse_perm].reshape(
                slab_h, width, 3)

        sample = unperm(sample)
        albedo = unperm(albedo)
        normal = unperm(normal)

        return st.replace(
            radiance_sum=st.radiance_sum + sample,
            sample_count=st.sample_count + jnp.uint32(1),
            albedo=albedo,
            normal=normal,
            frame_index=st.frame_index + jnp.uint32(1),
            ray_count=st.ray_count + jnp.sum(stats["rays"]),
            shadow_ray_count=st.shadow_ray_count + jnp.sum(stats["shadow_rays"]),
        )

    return jax.lax.fori_loop(0, n_samples, one_sample, state)


@functools.partial(jax.jit, static_argnames=("static", "n_samples", "chunk"))
def render_samples(scene: SceneArrays, uniforms: Uniforms, state: RenderState,
                   static: StaticConfig, n_samples: int,
                   chunk: int = DEFAULT_CHUNK) -> RenderState:
    """Single-device: advance the full frame by n_samples."""
    return render_rows(scene, uniforms, state, static, n_samples, 0, chunk)

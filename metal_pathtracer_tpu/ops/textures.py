"""Device texture arrays and PBR texture sampling.

Replaces MTKTextureLoader + hardware samplers
(reference: src/renderer/SceneResources.mm:1309-1388 texture upload,
shaders/pathtrace.metal:3015-3218 cone-LOD sampling contexts):

- all material textures are resampled to one uniform resolution class and
  stacked as a (T, S, S, 4) array plus a box-filtered mip chain — uniform
  shapes keep every lookup a plain gather (no per-texture control flow);
- sampling implements wrap/clamp addressing, bilinear + trilinear-by-LOD
  filtering, sRGB decode baked at upload for color slots, KHR_texture
  _transform, and dual UV sets (reference: vertex_uv_set, pathtrace.metal
  :593-596).
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np
from flax import struct

TEXTURE_SIZE = 512  # uniform resolution class (power of two)

Array = Any


@struct.dataclass
class TextureArrays:
    levels: Any                    # tuple of (T, S_l, S_l, 4) f32, mip chain
    wrap_mode: Array               # (T, 2) i32 — 0 repeat / 1 clamp / 2 mirror
    n_textures: int = struct.field(pytree_node=False, default=0)

    @property
    def max_lod(self) -> float:
        return float(len(self.levels) - 1)


def _srgb_to_linear(x: np.ndarray) -> np.ndarray:
    a = x / 255.0
    return np.where(a <= 0.04045, a / 12.92, ((a + 0.055) / 1.055) ** 2.4)


def build_texture_arrays(images: List[np.ndarray], srgb_flags: List[bool],
                         wrap_modes: Optional[List] = None,
                         size: int = TEXTURE_SIZE) -> Optional[TextureArrays]:
    """Resample (PIL bicubic) each RGBA image to `size`^2, decode sRGB for
    color slots, build the mip chain, stack on device."""
    import jax.numpy as jnp
    from PIL import Image

    if not images:
        return None
    base = np.zeros((len(images), size, size, 4), np.float32)
    for i, (img, srgb) in enumerate(zip(images, srgb_flags)):
        pil = Image.fromarray(img, "RGBA").resize((size, size),
                                                  Image.BILINEAR)
        arr = np.asarray(pil, np.uint8).astype(np.float32)
        if srgb:
            rgb = _srgb_to_linear(arr[..., :3])
            base[i, ..., :3] = rgb
        else:
            base[i, ..., :3] = arr[..., :3] / 255.0
        base[i, ..., 3] = arr[..., 3] / 255.0

    levels = [base]
    cur = base
    while cur.shape[1] > 1:
        h2 = cur.shape[1] // 2
        cur = cur.reshape(len(images), h2, 2, h2, 2, 4).mean((2, 4))
        levels.append(cur.astype(np.float32))

    if wrap_modes is None:
        wrap = np.zeros((len(images), 2), np.int32)
    else:
        wrap = np.asarray(wrap_modes, np.int32)

    return TextureArrays(
        levels=tuple(jnp.asarray(l) for l in levels),
        wrap_mode=jnp.asarray(wrap),
        n_textures=len(images),
    )


def _address(coord, size, mode):
    import jax.numpy as jnp

    wrapped = jnp.mod(coord, size)
    clamped = jnp.clip(coord, 0, size - 1)
    period = 2 * size
    m = jnp.mod(coord, period)
    mirrored = jnp.where(m < size, m, period - 1 - m)
    return jnp.where(mode == 0, wrapped,
                     jnp.where(mode == 1, clamped, mirrored))


def _bilinear(level, tex_id, u, v, wrap_s, wrap_t):
    import jax.numpy as jnp

    size = level.shape[1]
    x = u * size - 0.5
    y = v * size - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = _address(x0.astype(jnp.int32), size, wrap_s)
    x1i = _address(x0.astype(jnp.int32) + 1, size, wrap_s)
    y0i = _address(y0.astype(jnp.int32), size, wrap_t)
    y1i = _address(y0.astype(jnp.int32) + 1, size, wrap_t)
    c00 = level[tex_id, y0i, x0i]
    c10 = level[tex_id, y0i, x1i]
    c01 = level[tex_id, y1i, x0i]
    c11 = level[tex_id, y1i, x1i]
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_texture(textures: TextureArrays, tex_id, u, v, lod=None):
    """Trilinear RGBA sample at per-lane texture ids/uv/lod. `tex_id` < 0
    lanes return white (the reference binds a 1x1 white fallback)."""
    import jax.numpy as jnp

    valid = tex_id >= 0
    tid = jnp.maximum(tex_id, 0)
    wrap_s = textures.wrap_mode[tid, 0]
    wrap_t = textures.wrap_mode[tid, 1]

    if lod is None:
        color = _bilinear(textures.levels[0], tid, u, v, wrap_s, wrap_t)
    else:
        n_levels = len(textures.levels)
        lod = jnp.clip(lod, 0.0, float(n_levels - 1))
        lo = jnp.floor(lod).astype(jnp.int32)
        frac = (lod - lo.astype(jnp.float32))[..., None]
        taps = [_bilinear(l, tid, u, v, wrap_s, wrap_t)
                for l in textures.levels]
        stacked = jnp.stack(taps, 0)
        moved = jnp.moveaxis(stacked, 0, -2)
        onehot_lo = (jnp.arange(n_levels) == lo[..., None])[..., None]
        onehot_hi = (jnp.arange(n_levels)
                     == jnp.minimum(lo + 1, n_levels - 1)[..., None])[..., None]
        c_lo = jnp.sum(moved * onehot_lo, -2)
        c_hi = jnp.sum(moved * onehot_hi, -2)
        color = c_lo * (1.0 - frac) + c_hi * frac

    white = jnp.ones_like(color)
    return jnp.where(valid[..., None], color, white)


def apply_uv_transform(transform, u, v):
    """KHR_texture_transform 2x3 affine rows per lane
    (reference: pathtrace.metal PbrTextureSamplingContext)."""
    import jax.numpy as jnp

    nu = transform[..., 0, 0] * u + transform[..., 0, 1] * v + transform[..., 0, 2]
    nv = transform[..., 1, 0] * u + transform[..., 1, 1] * v + transform[..., 1, 2]
    return nu, nv


def lod_from_cone(cone_width, uv_area_scale, size: int = TEXTURE_SIZE):
    """Ray-cone footprint -> mip level (reference: cone->LOD with
    fallbacks, pathtrace.metal:141-257; simplified to the cone footprint
    over the hit's UV density — Igehy first-hit gradients are a tracked
    refinement)."""
    import jax.numpy as jnp

    texels = jnp.maximum(cone_width * uv_area_scale * size, 1e-6)
    return jnp.maximum(jnp.log2(texels), 0.0)

"""Fused per-depth shading megakernel.

The wavefront integrator's XLA shade stage measured ~24 ms/depth at 2M
lanes — ~59 separate fusions, each paying an HBM round-trip for every
intermediate (BENCHMARKS.md "Where the time goes"). This kernel runs the
ENTIRE per-depth shade stage (hit reconstruction, miss/background, medium
absorption, material fetch, BSDF sampling, clamps, Russian roulette,
carry commit) in ONE Pallas kernel whose intermediates never leave VMEM:
per depth the path state is read from HBM once and written once.

Data layout: the path carry lives as a single (P, N) f32 plane stack
(vectors stored as 3 scalar planes — the VPU is 8x128 lanes; (N,3) arrays
waste the lane axis) plus one u32 RNG plane. Plane indices in `Layout`.

Semantics are the wavefront integrator's, one-for-one
(ops/integrator.py body(); reference: pathtrace.metal
trace_path_software:5717-7284). The XLA path stays the reference
implementation: `fused_supported` gates this kernel to the configs it
covers and tests/tpu assert agreement.
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metal_pathtracer_tpu import constants as C

Array = Any

LANES = 128
ROWS = 32                 # sublane rows per block => 4096 lanes/block
BLOCK = ROWS * LANES

U32 = jnp.uint32
# shade_packed planes fed to the kernel: 0-8 verts, 9-17 normals (raw
# normal for analytic prims), 18 material, 19 mesh, 20 two_sided,
# 21 is_triangle (spare cols 22-23 stay host-side)
ROW_PLANES = 22
# python float (weak-typed) so constants fold exactly like the XLA path's
# (bsdf.py PI); a jnp scalar here would be captured as a pallas_call
# constant, which Pallas rejects
PI = 3.14159265358979323846


# ---------------------------------------------------------------------------
# Component-form vec3 (planes of (R,128) lanes)
# ---------------------------------------------------------------------------

class V3(NamedTuple):
    x: Array
    y: Array
    z: Array

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def vdot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def vcross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def vnormalize(a: V3) -> V3:
    # division (not rsqrt): bit-matches vecmath.normalize
    return a / jnp.sqrt(jnp.maximum(vdot(a, a), 1e-38))


def vsafe_normalize(a: V3) -> V3:
    len2 = vdot(a, a)
    inv = jnp.where(len2 > 0.0,
                    1.0 / jnp.sqrt(jnp.maximum(len2, 1e-38)), 0.0)
    return a * inv


def vwhere(m, a: V3, b: V3) -> V3:
    return V3(jnp.where(m, a.x, b.x), jnp.where(m, a.y, b.y),
              jnp.where(m, a.z, b.z))


def vfinite(a: V3):
    return (jnp.isfinite(a.x) & jnp.isfinite(a.y) & jnp.isfinite(a.z))


def vmax(a: V3):
    return jnp.maximum(jnp.maximum(a.x, a.y), a.z)


def vmaximum(a: V3, s) -> V3:
    return V3(jnp.maximum(a.x, s), jnp.maximum(a.y, s), jnp.maximum(a.z, s))


def vluminance(a: V3):
    w = C.LUMINANCE_WEIGHTS
    return a.x * w[0] + a.y * w[1] + a.z * w[2]


def vfull(like, x, y, z) -> V3:
    one = jnp.ones_like(like)
    return V3(one * x, one * y, one * z)


def vreflect(v: V3, n: V3) -> V3:
    return v - n * (2.0 * vdot(v, n))


def to_acescg(c: V3) -> V3:
    """(reference: pathtrace.metal:93-99)"""
    return V3(0.613097 * c.x + 0.339523 * c.y + 0.047380 * c.z,
              0.070194 * c.x + 0.916354 * c.y + 0.013452 * c.z,
              0.020616 * c.x + 0.109570 * c.y + 0.869815 * c.z)


# ---------------------------------------------------------------------------
# RNG (bit-compatible with ops/rng.py)
# ---------------------------------------------------------------------------

def _pcg_hash(state):
    state = state.astype(U32) * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> U32(28)) + U32(4))) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def _u32_to_f32(u):
    """Round-to-nearest u32 -> f32, bit-identical to XLA's astype(f32).

    Mosaic has no u32->f32 cast; split into high 24 bits (exact i32->f32,
    exact *256) + low 8 bits — the mathematical sum is the integer, so the
    single f32 add performs the one round-to-nearest the direct cast does.
    """
    hi = (u >> U32(8)).astype(jnp.int32).astype(jnp.float32)
    lo = (u & U32(0xFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * 256.0 + lo


def _rand(state):
    state = _pcg_hash(state)
    return state, _u32_to_f32(state) * (1.0 / 4294967296.0)


def _sample_cosine_hemisphere(state):
    state, r1 = _rand(state)
    state, r2 = _rand(state)
    phi = 2.0 * PI * r2
    r = jnp.sqrt(jnp.maximum(r1, 0.0))
    local = V3(jnp.cos(phi) * r, jnp.sin(phi) * r,
               jnp.sqrt(jnp.maximum(1.0 - r1, 0.0)))
    return state, local


def _build_onb(n: V3):
    """(reference: pathtrace.metal build_onb; ops/vecmath.py twin)"""
    nz = jnp.abs(n.z) < 0.999
    up = V3(jnp.where(nz, 0.0, 1.0), jnp.zeros_like(n.x),
            jnp.where(nz, 1.0, 0.0))
    tangent = vnormalize(vcross(up, n))
    bitangent = vcross(n, tangent)
    return tangent, bitangent


def _to_world(local: V3, n: V3) -> V3:
    t, b = _build_onb(n)
    return t * local.x + b * local.y + n * local.z


# ---------------------------------------------------------------------------
# Carry plane layout
# ---------------------------------------------------------------------------

class Layout:
    """Plane indices of the packed f32 carry. i32-valued quantities
    (ids, depths) ride as exact small floats (< 2^24)."""

    def __init__(self, has_medium: bool, env_mode: bool = False,
                 chains: bool = False):
        names = ["ox", "oy", "oz", "dx", "dy", "dz",
                 "tpr", "tpg", "tpb", "rr", "rg", "rb",
                 "alive", "last_pdf", "last_delta",
                 "prev_valid", "prev_mesh", "prev_prim",
                 "first_hit", "aar", "aag", "aab", "anx", "any", "anz",
                 "cone_w", "cone_s"]
        self.has_medium = has_medium
        self.env_mode = env_mode
        self.chains = chains
        self.med_slots = C.MAX_MEDIUM_STACK if has_medium else 0
        if has_medium:
            names.append("med_depth")
            for s in range(self.med_slots):
                names += [f"med{s}r", f"med{s}g", f"med{s}b"]
        if env_mode:
            names += ["env_lod", "env_lod_act"]
        if chains:
            # integrator PathCarry.specular_depth (MNEE eligibility
            # tests next_specular_depth == 1)
            names.append("specular_depth")
        self.names = names
        self.index = {n: i for i, n in enumerate(names)}
        self.P = len(names)

    def __getitem__(self, name):
        return self.index[name]


# material table columns (fused-path field set)
MAT_COLS = ["mat_type", "base_r", "base_g", "base_b", "roughness", "eta",
            "thin", "em_r", "em_g", "em_b", "emission_env",
            "ce_r", "ce_g", "ce_b", "ck_r", "ck_g", "ck_b",
            "has_conductor", "sa_r", "sa_g", "sa_b",
            "pbr_metallic", "pbr_transmission", "pbr_thickness",
            "pbr_double_sided",
            # plastic/carpaint coat layer (bsdf.plastic_* helpers)
            "coat_ior", "coat_roughness", "coat_thickness",
            "coat_sample_weight", "coat_fresnel_avg",
            "coat_tint_r", "coat_tint_g", "coat_tint_b",
            "coat_abs_r", "coat_abs_g", "coat_abs_b",
            # carpaint base/flake lobes (ops/carpaint.py)
            "carpaint_base_metallic", "carpaint_base_roughness",
            "carpaint_flake_scale", "carpaint_flake_sample_weight",
            "carpaint_flake_roughness", "carpaint_flake_anisotropy",
            "carpaint_flake_normal_strength", "carpaint_has_base_conductor",
            "cpe_r", "cpe_g", "cpe_b", "cpk_r", "cpk_g", "cpk_b",
            # subsurface (ops/sss.py separable profile)
            "sss_g", "sss_mfp", "sss_method", "sss_coat",
            "sss_sigma_override",
            "ssa_r", "ssa_g", "ssa_b", "ssss_r", "ssss_g", "ssss_b"]
MAT_COL = {n: i for i, n in enumerate(MAT_COLS)}

#: V3-valued Mat fields -> their MAT_COLS triples
MAT_V3 = {
    "base": ("base_r", "base_g", "base_b"),
    "emission": ("em_r", "em_g", "em_b"),
    "conductor_eta": ("ce_r", "ce_g", "ce_b"),
    "conductor_k": ("ck_r", "ck_g", "ck_b"),
    "sigma_a": ("sa_r", "sa_g", "sa_b"),
    "coat_tint": ("coat_tint_r", "coat_tint_g", "coat_tint_b"),
    "coat_absorption": ("coat_abs_r", "coat_abs_g", "coat_abs_b"),
    "carpaint_base_eta": ("cpe_r", "cpe_g", "cpe_b"),
    "carpaint_base_k": ("cpk_r", "cpk_g", "cpk_b"),
    "sss_sigma_a": ("ssa_r", "ssa_g", "ssa_b"),
    "sss_sigma_s": ("ssss_r", "ssss_g", "ssss_b"),
}

# dynamic scalar vector entries
SCAL = ["depth", "clamp_factor", "clamp_floor", "throughput_clamp",
        "spec_tail_base", "spec_tail_rough", "min_spec_pdf",
        "max_contribution", "clamp_enabled", "bg_r", "bg_g", "bg_b",
        "env_max_mip"]
SCAL_IDX = {n: i for i, n in enumerate(SCAL)}


def pack_material_table(materials) -> jnp.ndarray:
    """(M, K) f32 table in MAT_COLS order (kernel-side SMEM fetch)."""
    cols = [
        materials.mat_type.astype(jnp.float32),
        materials.base_color[:, 0], materials.base_color[:, 1],
        materials.base_color[:, 2],
        materials.roughness, materials.eta, materials.thin,
        materials.emission[:, 0], materials.emission[:, 1],
        materials.emission[:, 2], materials.emission_env,
        materials.conductor_eta[:, 0], materials.conductor_eta[:, 1],
        materials.conductor_eta[:, 2],
        materials.conductor_k[:, 0], materials.conductor_k[:, 1],
        materials.conductor_k[:, 2], materials.has_conductor,
        materials.dielectric_sigma_a[:, 0],
        materials.dielectric_sigma_a[:, 1],
        materials.dielectric_sigma_a[:, 2],
        materials.pbr_metallic,
        materials.pbr_transmission,
        materials.pbr_thickness,
        materials.pbr_double_sided,
        materials.coat_ior,
        materials.coat_roughness,
        materials.coat_thickness,
        materials.coat_sample_weight,
        materials.coat_fresnel_avg,
        materials.coat_tint[:, 0], materials.coat_tint[:, 1],
        materials.coat_tint[:, 2],
        materials.coat_absorption[:, 0], materials.coat_absorption[:, 1],
        materials.coat_absorption[:, 2],
        materials.carpaint_base_metallic,
        materials.carpaint_base_roughness,
        materials.carpaint_flake_scale,
        materials.carpaint_flake_sample_weight,
        materials.carpaint_flake_roughness,
        materials.carpaint_flake_anisotropy,
        materials.carpaint_flake_normal_strength,
        materials.carpaint_has_base_conductor,
        materials.carpaint_base_eta[:, 0], materials.carpaint_base_eta[:, 1],
        materials.carpaint_base_eta[:, 2],
        materials.carpaint_base_k[:, 0], materials.carpaint_base_k[:, 1],
        materials.carpaint_base_k[:, 2],
        materials.sss_g,
        materials.sss_mfp,
        materials.sss_method,
        materials.sss_coat,
        materials.sss_sigma_override,
        materials.sss_sigma_a[:, 0], materials.sss_sigma_a[:, 1],
        materials.sss_sigma_a[:, 2],
        materials.sss_sigma_s[:, 0], materials.sss_sigma_s[:, 1],
        materials.sss_sigma_s[:, 2],
    ]
    return jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)


class Mat:
    """Per-lane material parameters, fetched LAZILY from the SMEM table.

    Each field's m_count-row select chain is built only when the compiled
    code actually reads the field, so material families absent from the
    scene's static type set cost zero fetch work (the table now carries
    ~60 columns; an eager fetch would more than double the per-stage
    select count for every scene)."""

    __slots__ = ("_ref", "_mid", "_count", "_cache")

    def __init__(self, mat_ref, mid, m_count: int, cache=None):
        self._ref = mat_ref
        self._mid = mid
        self._count = m_count
        self._cache = dict(cache) if cache else {}

    def _col(self, k):
        acc = jnp.full_like(self._mid, self._ref[0, MAT_COL[k]],
                            dtype=jnp.float32)
        for i in range(1, self._count):
            acc = jnp.where(self._mid == i, self._ref[i, MAT_COL[k]], acc)
        return acc

    def __getattr__(self, name):
        # only reached when `name` is not a slot: fetch + memoize
        cache = self._cache
        if name in cache:
            return cache[name]
        if name in MAT_V3:
            val = V3(*(self._col(c) for c in MAT_V3[name]))
        elif name in MAT_COL:
            val = self._col(name)
        else:
            raise AttributeError(name)
        cache[name] = val
        return val

    def _replace(self, **overrides):
        out = Mat(self._ref, self._mid, self._count, self._cache)
        out._cache.update(overrides)
        return out


def _fetch_material(mat_ref, mid, m_count: int) -> Mat:
    """Lazy handle over the SMEM material table (see Mat). The fused path
    gates m_count <= 128 (scene cap 512; beyond 128 the XLA gather path
    wins)."""
    return Mat(mat_ref, mid, m_count)


# ---------------------------------------------------------------------------
# Clamps (bsdf.py twins, component form)
# ---------------------------------------------------------------------------

class Clamp(NamedTuple):
    factor: Array
    floor: Array
    throughput: Array
    tail_base: Array
    tail_rough: Array
    min_spec_pdf: Array
    max_contribution: Array
    enabled: Array


def _clamp_firefly(tp: V3, contribution: V3, p: Clamp) -> V3:
    combined = tp * contribution
    finite = vfinite(combined)
    positive = vmaximum(combined, 0.0)
    lum = vluminance(positive)
    tp_lum = vluminance(vmaximum(tp, 0.0))
    max_lum = jnp.maximum(tp_lum * p.factor, p.floor)
    max_lum = jnp.where(p.max_contribution > 0.0,
                        jnp.maximum(max_lum, p.max_contribution), max_lum)
    scale = jnp.where((lum > max_lum) & (lum > 0.0),
                      max_lum / jnp.maximum(lum, 1e-6), 1.0)
    clamped = vmaximum(combined * scale, 0.0)
    out = vwhere(p.enabled < 0.5, positive, clamped)
    return vwhere(finite, out, vfull(lum, 0.0, 0.0, 0.0))


def _clamp_path_throughput(tp: V3, p: Clamp) -> V3:
    finite = vfinite(tp)
    positive = vmaximum(tp, 0.0)
    lum = vluminance(positive)
    scale = jnp.where((lum > p.throughput) & (lum > 0.0),
                      p.throughput / jnp.maximum(lum, 1e-6), 1.0)
    active = (p.enabled >= 0.5) & (p.throughput > 0.0)
    out = vwhere(active, tp * scale, tp)
    return vwhere(finite, out, vfull(lum, 0.0, 0.0, 0.0))


def _clamp_specular_pdf(pdf, p: Clamp):
    pdf = jnp.where(jnp.isfinite(pdf), pdf, 0.0)
    pdf = jnp.maximum(pdf, 0.0)
    raised = jnp.where(p.min_spec_pdf > 0.0,
                       jnp.maximum(pdf, p.min_spec_pdf), pdf)
    return jnp.where(pdf > 0.0, raised, 0.0)


def _clamp_specular_tail(value: V3, roughness, f0: V3, p: Clamp) -> V3:
    finite = vfinite(value)
    positive = vmaximum(value, 0.0)
    strength = jnp.maximum(vmax(f0), 1e-3)
    limit = (p.tail_base + p.tail_rough * roughness) * strength
    limit = jnp.maximum(limit, p.floor)
    lum = vluminance(positive)
    scale = jnp.where((lum > limit) & (lum > 0.0),
                      limit / jnp.maximum(lum, 1e-6), 1.0)
    active = (p.enabled >= 0.5) & ((p.tail_base > 0.0) | (p.tail_rough > 0.0))
    out = vwhere(active, positive * scale, positive)
    return vwhere(finite, out, vfull(lum, 0.0, 0.0, 0.0))


# ---------------------------------------------------------------------------
# Fresnel / GGX (bsdf.py twins)
# ---------------------------------------------------------------------------

def _schlick_weight(cos_theta):
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return m * m * m * m * m


def _schlick_fresnel(f0: V3, cos_theta) -> V3:
    w = _schlick_weight(cos_theta)
    return f0 + (1.0 - f0) * w


def _fresnel_dielectric_exact(cos_theta_i, eta_i, eta_t):
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    abs_cos = jnp.abs(cos_theta_i)
    sin2_i = jnp.maximum(0.0, 1.0 - abs_cos * abs_cos)
    eta = eta_i / eta_t
    sin2_t = eta * eta * sin2_i
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    ei_ci = eta_i * abs_cos
    et_ct = eta_t * cos_t
    rs = (ei_ci - et_ct) / (ei_ci + et_ct)
    rp = (eta_t * abs_cos - eta_i * cos_t) / (eta_t * abs_cos + eta_i * cos_t)
    fr = 0.5 * (rs * rs + rp * rp)
    fr = jnp.where(tir, 1.0, fr)
    cos_t = jnp.where(tir, 0.0, cos_t)
    return fr, cos_t


def _fresnel_conductor(cos_theta_i, eta: V3, k: V3) -> V3:
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    cos2 = cos_theta_i * cos_theta_i
    sin2 = jnp.maximum(0.0, 1.0 - cos2)

    def one(e, kk):
        eta2 = e * e
        k2 = kk * kk
        t0 = eta2 - k2 - sin2
        a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * k2, 0.0))
        a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
        term1 = a2b2 + cos2
        term2 = 2.0 * cos_theta_i * a
        rs = (term1 - term2) / (term1 + term2)
        term3 = cos2 * a2b2 + sin2 * sin2
        term4 = term2 * sin2
        rp = (term3 - term4) / (term3 + term4)
        return jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)

    return V3(one(eta.x, k.x), one(eta.y, k.y), one(eta.z, k.z))


def _ggx_lambda(alpha, cos_theta):
    abs_cos = jnp.abs(cos_theta)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - abs_cos * abs_cos))
    tan_theta = sin_theta / jnp.maximum(abs_cos, 1e-20)
    a = alpha * tan_theta
    lam = (-1.0 + jnp.sqrt(1.0 + a * a)) * 0.5
    return jnp.where((abs_cos <= 0.0) | (sin_theta == 0.0), 0.0, lam)


def _ggx_g1(alpha, cos_theta):
    return 1.0 / (1.0 + _ggx_lambda(alpha, cos_theta))


def _ggx_d(alpha, cos_theta_h):
    abs_ch = jnp.abs(cos_theta_h)
    a2 = alpha * alpha
    denom = abs_ch * abs_ch * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def _ggx_pdf(alpha, n: V3, wo: V3, wi: V3):
    wh = vsafe_normalize(wo + wi)
    cos_h = vdot(n, wh)
    dot_wo_wh = vdot(wo, wh)
    cos_o = vdot(n, wo)
    d = _ggx_d(alpha, cos_h)
    g1 = _ggx_g1(alpha, cos_o)
    pdf = d * g1 * cos_h / (4.0 * jnp.maximum(dot_wo_wh, 1e-6))
    return jnp.where((cos_o <= 0.0) | (cos_h <= 0.0) | (dot_wo_wh <= 0.0),
                     0.0, pdf)


def _sample_ggx_vndf(n: V3, wo: V3, roughness, state):
    """(bsdf.sample_ggx_vndf twin — 2 draws)"""
    won = vsafe_normalize(wo)
    t, b = _build_onb(n)
    wo_l = V3(vdot(won, t), vdot(won, b), jnp.maximum(vdot(won, n), 1e-6))
    alpha = jnp.maximum(roughness * roughness, 1e-4)
    vh = vsafe_normalize(V3(alpha * wo_l.x, alpha * wo_l.y, wo_l.z))
    lensq = vh.x * vh.x + vh.y * vh.y
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-38))
    t1 = vwhere(lensq > 0.0, V3(-vh.y * inv, vh.x * inv,
                                jnp.zeros_like(inv)),
                vfull(inv, 1.0, 0.0, 0.0))
    t2 = vcross(vh, t1)
    state, u1 = _rand(state)
    state, u2 = _rand(state)
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh.z)
    p2_adj = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2_adj * p2_adj))
    nh = t1 * p1 + t2 * p2_adj + vh * p3
    ne = vsafe_normalize(V3(alpha * nh.x, alpha * nh.y,
                            jnp.maximum(nh.z, 0.0)))
    world = vsafe_normalize(t * ne.x + b * ne.y + n * ne.z)
    return state, world


def _dfg_approx(roughness, nov):
    r0 = roughness * -1.0 + 1.0
    r1 = roughness * -0.0275 + 0.0425
    r2 = roughness * -0.572 + 1.04
    r3 = roughness * 0.022 - 0.04
    a004 = jnp.minimum(r0 * r0, jnp.exp2(-9.28 * nov)) * r0 + r1
    return -1.04 * a004 + r2, 1.04 * a004 + r3


def _specular_energy_compensation(f0: V3, roughness, nov) -> V3:
    nov_c = jnp.clip(nov, 0.0, 1.0)
    dfg_x, dfg_y = _dfg_approx(roughness, nov_c)

    def comp(f):
        fss = jnp.clip(f * dfg_x + dfg_y, 0.0, 0.99)
        favg = f + (1.0 - f) * C.SCHLICK_AVERAGE_FACTOR
        one_minus = jnp.clip(1.0 - fss, 0.0, 1.0)
        denom = jnp.maximum(1.0 - favg * one_minus, 1e-3)
        fms = (favg * one_minus) / denom
        return jnp.clip((fss + fms) / jnp.maximum(fss, 1e-4), 1.0, 2.0)

    return V3(comp(f0.x), comp(f0.y), comp(f0.z))


# ---------------------------------------------------------------------------
# BSDF sampling (phase-1 types; bsdf.py twins, identical RNG consumption)
# ---------------------------------------------------------------------------

class Sample(NamedTuple):
    direction: V3
    weight: V3
    pdf: Array
    directional_pdf: Array
    is_delta: Array     # bool
    medium_event: Array  # f32 -1/0/+1
    lobe_type: Array    # f32 0 diffuse / 1 glossy
    lobe_roughness: Array
    # BSSRDF exit (SUBSURFACE only; constant zeros otherwise — XLA folds
    # the merges away when the type set has no SSS)
    has_exit_point: Array = None   # bool
    exit_point: V3 = None
    exit_normal: V3 = None

    @classmethod
    def invalid(cls, like):
        z = jnp.zeros_like(like)
        fb = jnp.zeros_like(like, dtype=bool)
        return cls(V3(z, z, z), V3(z, z, z), z, z,
                   fb, z, z, z, fb, V3(z, z, z), V3(z, z, z))


def _sel_sample(mask, a: Sample, b: Sample) -> Sample:
    return Sample(vwhere(mask, a.direction, b.direction),
                  vwhere(mask, a.weight, b.weight),
                  jnp.where(mask, a.pdf, b.pdf),
                  jnp.where(mask, a.directional_pdf, b.directional_pdf),
                  (mask & a.is_delta) | (~mask & b.is_delta),
                  jnp.where(mask, a.medium_event, b.medium_event),
                  jnp.where(mask, a.lobe_type, b.lobe_type),
                  jnp.where(mask, a.lobe_roughness, b.lobe_roughness),
                  (mask & a.has_exit_point) | (~mask & b.has_exit_point),
                  vwhere(mask, a.exit_point, b.exit_point),
                  vwhere(mask, a.exit_normal, b.exit_normal))


def _material_is_delta(m: Mat):
    rough = jnp.clip(m.roughness, 0.0, 1.0)
    return ((m.mat_type == C.MATERIAL_DIELECTRIC)
            | ((m.mat_type == C.MATERIAL_METAL) & (rough <= 1e-3))
            | ((m.mat_type == C.MATERIAL_PBR) & (rough <= 1e-3)))


def _material_base_color(m: Mat) -> V3:
    return V3(jnp.clip(m.base.x, 0.0, 1.0), jnp.clip(m.base.y, 0.0, 1.0),
              jnp.clip(m.base.z, 0.0, 1.0))


def _has_conductor_ior(m: Mat):
    return ((m.has_conductor > 0.0)
            | (m.conductor_eta.x > 0.0) | (m.conductor_eta.y > 0.0)
            | (m.conductor_eta.z > 0.0)
            | (m.conductor_k.x > 0.0) | (m.conductor_k.y > 0.0)
            | (m.conductor_k.z > 0.0))


def _conductor_f0(m: Mat) -> V3:
    one = jnp.ones_like(m.roughness)
    fc = _fresnel_conductor(one, m.conductor_eta, m.conductor_k)
    return vwhere(_has_conductor_ior(m), fc, _material_base_color(m))


def _sample_lambert(m: Mat, n: V3, state, diffuse_occlusion):
    """(bsdf._sample_lambert twin)"""
    state, local = _sample_cosine_hemisphere(state)
    wi = vsafe_normalize(_to_world(local, n))
    cos_i = vdot(n, wi)
    pdf = jnp.where(cos_i > 0.0, cos_i / PI, 0.0)
    albedo = _material_base_color(m) * jnp.clip(diffuse_occlusion, 0.0, 1.0)
    weight = vmaximum(albedo * (1.0 / PI)
                      * (cos_i / jnp.maximum(pdf, 1e-20)), 0.0)
    ok = (cos_i > 0.0) & (pdf > 0.0) & vfinite(weight)
    out = Sample.invalid(cos_i)
    out = out._replace(
        direction=vwhere(ok, wi, out.direction),
        weight=vwhere(ok, weight, out.weight),
        pdf=jnp.where(ok, pdf, 0.0),
        directional_pdf=jnp.where(ok, pdf, 0.0),
        lobe_roughness=jnp.where(ok, 1.0, 0.0))
    return state, out


def _sample_metal(m: Mat, n: V3, wo: V3, incident: V3, state, clamp_p):
    roughness = jnp.clip(m.roughness, 0.0, 1.0)
    f0 = _conductor_f0(m)
    has_ior = _has_conductor_ior(m)
    smooth = roughness <= 1e-3

    wi_d = vreflect(incident, n)
    cos_i_d = vdot(n, wi_d)
    cos_o = vdot(n, wo)
    cos_t = jnp.maximum(cos_o, 0.0)
    f_delta = vwhere(has_ior,
                     _fresnel_conductor(cos_t, m.conductor_eta, m.conductor_k),
                     _schlick_fresnel(f0, cos_t))
    delta_ok = cos_i_d > 0.0

    state_r, wh = _sample_ggx_vndf(n, wo, roughness, state)
    alpha = roughness * roughness
    wi_r = vsafe_normalize(vreflect(-wo, wh))
    cos_i = vdot(n, wi_r)
    dot_wo_wh = vdot(wo, wh)
    d = _ggx_d(alpha, vdot(n, wh))
    g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i)
    f_rough = vwhere(has_ior,
                     _fresnel_conductor(vdot(wi_r, wh), m.conductor_eta,
                                        m.conductor_k),
                     _schlick_fresnel(f0, vdot(wi_r, wh)))
    denom = 4.0 * cos_o * cos_i
    f_val = f_rough * (d * g / jnp.maximum(denom, 1e-6))
    f_val = f_val * _specular_energy_compensation(f0, roughness, cos_o)
    f_val = _clamp_specular_tail(f_val, roughness, f0, clamp_p)
    pdf_raw = _ggx_pdf(alpha, n, wo, wi_r)
    pdf = _clamp_specular_pdf(pdf_raw, clamp_p)
    weight = vmaximum(f_val * (cos_i / jnp.maximum(pdf, 1e-20)), 0.0)
    rough_ok = ((vdot(wh, n) > 0.0) & vfinite(wi_r)
                & (cos_i > 0.0) & (cos_o > 0.0) & (dot_wo_wh > 0.0)
                & (pdf_raw > 0.0) & vfinite(weight))

    out = Sample.invalid(cos_o)
    rough_valid = jnp.logical_and(~smooth, rough_ok)
    out = out._replace(
        direction=vwhere(rough_valid, wi_r, out.direction),
        weight=vwhere(rough_valid, weight, out.weight),
        pdf=jnp.where(rough_valid, pdf, out.pdf),
        directional_pdf=jnp.where(rough_valid, pdf, out.directional_pdf),
        lobe_type=jnp.where(rough_valid, 1.0, out.lobe_type),
        lobe_roughness=jnp.where(rough_valid, roughness, out.lobe_roughness))
    delta_valid = jnp.logical_and(smooth, delta_ok)
    out = out._replace(
        direction=vwhere(delta_valid, wi_d, out.direction),
        weight=vwhere(delta_valid, f_delta, out.weight),
        pdf=jnp.where(delta_valid, 1.0, out.pdf),
        directional_pdf=jnp.where(delta_valid, 1.0, out.directional_pdf),
        is_delta=out.is_delta | delta_valid,
        lobe_type=jnp.where(delta_valid, 1.0, out.lobe_type),
        lobe_roughness=jnp.where(delta_valid, roughness, out.lobe_roughness))
    state = jnp.where(smooth, state, state_r)
    return state, out


def _vrefract(v: V3, n: V3, eta_ratio) -> V3:
    cos_i = -vdot(v, n)
    sin2_t = eta_ratio * eta_ratio * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    k = 1.0 - sin2_t
    refr = v * eta_ratio + n * (eta_ratio * cos_i
                                - jnp.sqrt(jnp.maximum(k, 0.0)))
    return vwhere(k >= 0.0, refr, vfull(cos_i, 0.0, 0.0, 0.0))


def _sample_dielectric(m: Mat, n: V3, incident: V3, front_face, state):
    is_thin = (m.mat_type == C.MATERIAL_DIELECTRIC) & (m.thin > 0.5)
    ref_idx = jnp.maximum(m.eta, 1.0)
    inside = jnp.logical_and(~is_thin, ~front_face)
    eta_i = jnp.where(inside, ref_idx, 1.0)
    eta_t = jnp.where(inside, 1.0, ref_idx)
    relative_eta = eta_i / eta_t
    cos_o = jnp.clip(vdot(-incident, n), -1.0, 1.0)
    fr, cos_t = _fresnel_dielectric_exact(cos_o, eta_i, eta_t)

    state, xi = _rand(state)
    choose_reflect = xi < fr

    refl_dir = vreflect(incident, n)
    refr_dir = _vrefract(incident, n, relative_eta)
    refr_len2 = vdot(refr_dir, refr_dir)
    refr_failed = refr_len2 <= 0.0
    refr_unit = refr_dir / jnp.sqrt(jnp.maximum(refr_len2, 1e-38))

    eta_scale = (eta_t * eta_t) / (eta_i * eta_i)
    dir_scale = eta_scale * (jnp.abs(cos_t) / jnp.maximum(jnp.abs(cos_o),
                                                          1e-6))
    refr_weight = jnp.maximum(1.0 - fr, 0.0) * dir_scale

    reflecting = jnp.logical_or(choose_reflect, refr_failed)
    direction = vwhere(reflecting, refl_dir, refr_unit)
    w_scalar = jnp.where(reflecting, fr, refr_weight)
    weight = V3(w_scalar, w_scalar, w_scalar)
    medium_event = jnp.where(jnp.logical_and(~reflecting, ~is_thin),
                             jnp.where(front_face, 1.0, -1.0), 0.0)
    one = jnp.ones_like(fr)
    return state, Sample.invalid(fr)._replace(
        direction=vsafe_normalize(direction),
        weight=weight,
        pdf=one,
        directional_pdf=one,
        is_delta=jnp.ones_like(fr, dtype=bool),
        medium_event=medium_event,
        lobe_type=one,
        lobe_roughness=jnp.zeros_like(fr))


def _plastic_coat_f0(m: Mat):
    """(bsdf.plastic_coat_f0 twin; coat IOR rides m.eta per
    bsdf.plastic_coat_ior)"""
    eta = jnp.maximum(m.eta, 1.0)
    ratio = (eta - 1.0) / jnp.maximum(eta + 1.0, 1e-6)
    return jnp.clip(ratio * ratio, 0.0, 0.999)


def _vclip01(a: V3) -> V3:
    return V3(jnp.clip(a.x, 0.0, 1.0), jnp.clip(a.y, 0.0, 1.0),
              jnp.clip(a.z, 0.0, 1.0))


def _vexp(a: V3) -> V3:
    return V3(jnp.exp(a.x), jnp.exp(a.y), jnp.exp(a.z))


def _plastic_specular_tint(m: Mat) -> V3:
    """(bsdf.plastic_specular_tint twin)"""
    tint = _vclip01(m.coat_tint)
    thickness = jnp.maximum(m.coat_thickness, 0.0)
    absorption = vmaximum(m.coat_absorption, 0.0)
    attenuated = _vclip01(tint * _vexp(-absorption * thickness))
    skip = ((thickness <= 0.0)
            | ((absorption.x <= 1e-6) & (absorption.y <= 1e-6)
               & (absorption.z <= 1e-6)))
    return vwhere(skip, tint, attenuated)


def _plastic_diffuse_transmission(m: Mat, cos_i, cos_o) -> V3:
    """(bsdf.plastic_diffuse_transmission twin)"""
    thickness = jnp.maximum(m.coat_thickness, 0.0)
    tint = _vclip01(m.coat_tint)
    absorption = vmaximum(m.coat_absorption, 0.0)
    safe_i = jnp.maximum(cos_i, 1e-3)
    safe_o = jnp.maximum(cos_o, 1e-3)
    att_i = _vexp(-absorption * (thickness / safe_i))
    att_o = _vexp(-absorption * (thickness / safe_o))
    full = _vclip01(tint * att_i * att_o)
    return vwhere(thickness <= 0.0, tint, full)


def _lambert_pdf(n: V3, wi: V3):
    d = vnormalize(wi)
    cos_t = jnp.maximum(vdot(n, d), 0.0)
    return jnp.where(cos_t > 0.0, cos_t / PI, 0.0)


def _plastic_eval(m: Mat, n: V3, wo: V3, wi: V3, clamp_p: Clamp,
                  diffuse_occlusion, cos_o, cos_i):
    """(bsdf.evaluate_bsdf PLASTIC branch twin) -> (value V3, pdf)"""
    coat_roughness = jnp.maximum(jnp.clip(m.coat_roughness, 0.0, 1.0), 1e-3)
    alpha = coat_roughness * coat_roughness
    f0 = _plastic_coat_f0(m)
    f0c = V3(f0, f0, f0)
    wh = vsafe_normalize(wo + wi)
    half_ok = (vdot(wh, n) > 0.0) & (vdot(wo, wh) > 0.0) \
        & (vdot(wi, wh) > 0.0)
    d = _ggx_d(alpha, vdot(n, wh))
    g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i)
    f = _schlick_fresnel(f0c, vdot(wi, wh))
    spec = f * (d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6))
    spec = _clamp_specular_tail(spec, coat_roughness, f0c, clamp_p)
    spec = spec * _plastic_specular_tint(m)
    spec = vwhere(half_ok, vmaximum(spec, 0.0), vfull(cos_o, 0.0, 0.0, 0.0))
    spec_pdf_raw = _ggx_pdf(alpha, n, wo, wi)
    spec_pdf = jnp.where(half_ok & (spec_pdf_raw > 0.0),
                         _clamp_specular_pdf(spec_pdf_raw, clamp_p), 0.0)

    f_i = _schlick_fresnel(f0c, cos_i)
    f_o = _schlick_fresnel(f0c, cos_o)
    tint = _plastic_diffuse_transmission(m, cos_i, cos_o)
    diffuse = _material_base_color(m) * (1.0 / PI)
    diffuse = diffuse * jnp.clip(diffuse_occlusion, 0.0, 1.0)
    diffuse = diffuse * tint * (1.0 - f_i) * (1.0 - f_o)
    diffuse = diffuse * jnp.maximum(
        1.0 - jnp.clip(m.coat_fresnel_avg, 0.0, 1.0), 0.0)
    diffuse = vmaximum(diffuse, 0.0)
    diff_pdf = _lambert_pdf(n, wi)
    p_coat = jnp.clip(m.coat_sample_weight, 0.0, 1.0)
    p_diffuse = 1.0 - p_coat
    return spec + diffuse, p_coat * spec_pdf + p_diffuse * diff_pdf


def _sample_plastic(m: Mat, n: V3, wo: V3, state, clamp_p: Clamp,
                    diffuse_occlusion):
    """(bsdf._sample_plastic twin; the fused gate excludes
    debug_specular_only so those carve-outs are dropped).

    Draws 1 selector + 2 lobe uniforms per lane (both lobes draw exactly
    2, so the merged RNG state is branch-independent)."""
    cos_o = vdot(n, wo)
    coat_roughness = jnp.maximum(jnp.clip(m.coat_roughness, 0.0, 1.0), 1e-3)
    alpha = coat_roughness * coat_roughness
    f0 = _plastic_coat_f0(m)
    f0c = V3(f0, f0, f0)
    p_coat = jnp.clip(m.coat_sample_weight, 0.0, 1.0)
    p_diffuse = 1.0 - p_coat
    fresnel_avg = jnp.clip(m.coat_fresnel_avg, 0.0, 1.0)
    spec_tint = _plastic_specular_tint(m)

    state, selector = _rand(state)
    sample_coat = jnp.logical_and(selector < p_coat, p_coat > 0.0)

    # --- coat branch (2 draws via VNDF)
    state_c, wh = _sample_ggx_vndf(n, wo, coat_roughness, state)
    wi_c = vsafe_normalize(vreflect(-wo, wh))
    cos_i_c = vdot(n, wi_c)
    dot_wi_wh = vdot(wi_c, wh)
    d = _ggx_d(alpha, vdot(n, wh))
    g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i_c)
    f = _schlick_fresnel(f0c, dot_wi_wh)
    spec = f * (d * g / jnp.maximum(4.0 * cos_o * cos_i_c, 1e-6))
    spec = _clamp_specular_tail(spec, coat_roughness, f0c, clamp_p)
    spec = spec * spec_tint
    spec_pdf_raw = _ggx_pdf(alpha, n, wo, wi_c)
    spec_pdf = jnp.where(spec_pdf_raw > 0.0,
                         _clamp_specular_pdf(spec_pdf_raw, clamp_p), 0.0)
    diff_pdf_c = _lambert_pdf(n, wi_c)
    combined_pdf_c = p_coat * spec_pdf + p_diffuse * diff_pdf_c
    weight_c = spec * (cos_i_c / jnp.maximum(combined_pdf_c, 1e-20))
    coat_ok = ((vdot(wh, n) > 0.0) & (cos_i_c > 0.0) & (dot_wi_wh > 0.0)
               & (combined_pdf_c > 0.0) & vfinite(weight_c))

    # --- diffuse branch (2 draws via cosine hemisphere)
    state_d, local = _sample_cosine_hemisphere(state)
    wi_d = vsafe_normalize(_to_world(local, n))
    cos_i_d = vdot(n, wi_d)
    diffuse = _material_base_color(m) * (1.0 / PI)
    diffuse = diffuse * jnp.clip(diffuse_occlusion, 0.0, 1.0)
    tint_through = _plastic_diffuse_transmission(m, cos_i_d, cos_o)
    f_i = _schlick_fresnel(f0c, cos_i_d)
    f_o = _schlick_fresnel(f0c, cos_o)
    diffuse = diffuse * tint_through * (1.0 - f_i) * (1.0 - f_o)
    diffuse = diffuse * jnp.maximum(1.0 - fresnel_avg, 0.0)
    diffuse = vmaximum(diffuse, 0.0)
    diff_pdf_d = _lambert_pdf(n, wi_d)
    spec_pdf_raw_d = _ggx_pdf(alpha, n, wo, wi_d)
    spec_pdf_d = jnp.where(spec_pdf_raw_d > 0.0,
                           _clamp_specular_pdf(spec_pdf_raw_d, clamp_p), 0.0)
    combined_pdf_d = p_coat * spec_pdf_d + p_diffuse * diff_pdf_d
    weight_d = diffuse * (cos_i_d / jnp.maximum(combined_pdf_d, 1e-20))
    diff_ok = ((cos_i_d > 0.0) & (combined_pdf_d > 0.0)
               & vfinite(weight_d))

    out = Sample.invalid(cos_o)
    coat_valid = sample_coat & coat_ok & (cos_o > 0.0)
    diff_valid = (~sample_coat) & diff_ok & (cos_o > 0.0)
    out = out._replace(
        direction=vwhere(coat_valid, wi_c,
                         vwhere(diff_valid, wi_d, out.direction)),
        weight=vwhere(coat_valid, vmaximum(weight_c, 0.0),
                      vwhere(diff_valid, vmaximum(weight_d, 0.0),
                             out.weight)),
        pdf=jnp.where(coat_valid, combined_pdf_c,
                      jnp.where(diff_valid, combined_pdf_d, 0.0)),
        directional_pdf=jnp.where(coat_valid, combined_pdf_c,
                                  jnp.where(diff_valid, combined_pdf_d,
                                            0.0)),
        lobe_type=jnp.where(coat_valid, 1.0, 0.0),
        lobe_roughness=jnp.where(coat_valid, coat_roughness,
                                 jnp.where(diff_valid, 1.0, 0.0)))
    state = jnp.where(sample_coat, state_c, state_d)
    return state, out


def _carpaint_hash3(p: V3) -> V3:
    """(carpaint._hash3 twin; reference pathtrace.metal carpaint_hash3)"""
    px = jnp.mod(p.x * 0.3183099 + 0.1, 1.0)
    py = jnp.mod(p.y * 0.3183099 + 0.3, 1.0)
    pz = jnp.mod(p.z * 0.3183099 + 0.7, 1.0)
    s = (px * (py + 33.33) + py * (pz + 55.55) + pz * (px + 77.77))
    px = px + s
    py = py + s
    pz = pz + s
    return V3(jnp.mod((px + py) * 13.5453123, 1.0),
              jnp.mod((px + pz) * 13.5453123, 1.0),
              jnp.mod((py + pz) * 13.5453123, 1.0))


def _flake_normal(m: Mat, position: V3, normal: V3) -> V3:
    """(carpaint.flake_normal twin; reference
    pathtrace.metal carpaint_flake_normal:3371-3392)"""
    rand = _carpaint_hash3(position * m.carpaint_flake_scale)
    anis = m.carpaint_flake_anisotropy
    ax = jnp.maximum(1.0 - anis, 1e-3)
    ay = jnp.maximum(1.0 + anis, 1e-3)
    phi = 2.0 * PI * rand.x
    r = jnp.sqrt(jnp.maximum(rand.y, 1e-4))
    x = r * jnp.cos(phi) * ax
    y = r * jnp.sin(phi) * ay
    m2 = jnp.clip(x * x + y * y, 0.0, 0.99)
    z = jnp.sqrt(jnp.maximum(1.0 - m2, 0.0))
    tangent, bitangent = _build_onb(normal)
    perturbed = vnormalize(tangent * x + bitangent * y + normal * z)
    strength = m.carpaint_flake_normal_strength
    return vnormalize(normal + (perturbed - normal) * strength)


def _carpaint_base_f0(m: Mat) -> V3:
    has = m.carpaint_has_base_conductor > 0.0
    one = jnp.ones_like(m.carpaint_has_base_conductor)
    fc = _fresnel_conductor(one, m.carpaint_base_eta, m.carpaint_base_k)
    return vwhere(has, fc, _material_base_color(m))


def _carpaint_eval_coat(m: Mat, n: V3, wo: V3, wi: V3, clamp_p: Clamp):
    """(carpaint._eval_coat twin)"""
    cos_o = jnp.maximum(vdot(n, wo), 0.0)
    cos_i = jnp.maximum(vdot(n, wi), 0.0)
    roughness = jnp.maximum(jnp.clip(m.coat_roughness, 0.0, 1.0), 1e-3)
    alpha = jnp.maximum(roughness * roughness, 1e-4)
    wh = vsafe_normalize(wo + wi)
    geo = (cos_i > 0.0) & (cos_o > 0.0) & (vdot(wh, n) > 0.0) \
        & (vdot(wo, wh) > 0.0) & (vdot(wi, wh) > 0.0)
    d = _ggx_d(alpha, vdot(n, wh))
    g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i)
    f0 = _plastic_coat_f0(m)
    f = _schlick_fresnel(V3(f0, f0, f0), vdot(wi, wh))
    spec = f * (d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6))
    spec = _clamp_specular_tail(spec * _plastic_specular_tint(m),
                                roughness, V3(f0, f0, f0), clamp_p)
    pdf_raw = _ggx_pdf(alpha, n, wo, wi)
    ok = geo & (pdf_raw > 0.0)
    pdf = jnp.where(ok, _clamp_specular_pdf(pdf_raw, clamp_p), 0.0)
    return vwhere(ok, spec, vfull(cos_o, 0.0, 0.0, 0.0)), pdf


def _carpaint_eval_flake(m: Mat, position: V3, n: V3, wo: V3, wi: V3,
                         clamp_p: Clamp):
    """(carpaint._eval_flake twin)"""
    fn = _flake_normal(m, position, n)
    cos_o = jnp.maximum(vdot(fn, wo), 0.0)
    cos_i = jnp.maximum(vdot(fn, wi), 0.0)
    roughness = jnp.maximum(
        jnp.clip(m.carpaint_flake_roughness, 0.0, 1.0), 1e-3)
    alpha = roughness * roughness
    wh = vsafe_normalize(wo + wi)
    geo = (cos_i > 0.0) & (cos_o > 0.0) & (vdot(wh, fn) > 0.0) \
        & (vdot(wo, wh) > 0.0) & (vdot(wi, wh) > 0.0)
    d = _ggx_d(alpha, vdot(fn, wh))
    g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i)
    f0 = _carpaint_base_f0(m)
    f = _schlick_fresnel(f0, vdot(wi, wh))
    spec = f * (d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6))
    spec = _clamp_specular_tail(spec * _plastic_specular_tint(m),
                                roughness, f0, clamp_p)
    coat_avg = jnp.clip(m.coat_fresnel_avg, 0.0, 1.0)
    spec = spec * jnp.maximum(1.0 - coat_avg, 0.0)
    pdf_raw = _ggx_pdf(alpha, fn, wo, wi)
    ok = geo & (pdf_raw > 0.0)
    pdf = jnp.where(ok, _clamp_specular_pdf(pdf_raw, clamp_p), 0.0)
    return vwhere(ok, spec, vfull(cos_o, 0.0, 0.0, 0.0)), pdf


def _carpaint_eval_base(m: Mat, n: V3, wo: V3, wi: V3, clamp_p: Clamp):
    """(carpaint._eval_base twin)"""
    cos_o = jnp.maximum(vdot(n, wo), 0.0)
    cos_i = jnp.maximum(vdot(n, wi), 0.0)
    geo = (cos_i > 0.0) & (cos_o > 0.0)

    metallic = jnp.clip(m.carpaint_base_metallic, 0.0, 1.0)
    diffuse_w = jnp.maximum(1.0 - metallic, 0.0)
    spec_w = jnp.maximum(metallic, 0.0)
    coat_avg = jnp.clip(m.coat_fresnel_avg, 0.0, 1.0)
    base_color = _material_base_color(m)

    zero = vfull(cos_o, 0.0, 0.0, 0.0)
    combined = zero
    diffuse = base_color * (1.0 / PI)
    coat_trans = _plastic_diffuse_transmission(m, cos_i, cos_o)
    diffuse = diffuse * coat_trans * jnp.maximum(1.0 - coat_avg, 0.0)
    diffuse = vmaximum(diffuse, 0.0)
    use_diff = diffuse_w > 1e-4
    combined = combined + vwhere(use_diff, diffuse * diffuse_w, zero)
    pdf_diffuse = jnp.where(use_diff, _lambert_pdf(n, wi), 0.0)

    roughness = jnp.maximum(
        jnp.clip(m.carpaint_base_roughness, 0.0, 1.0), 1e-3)
    alpha = roughness * roughness
    wh = vsafe_normalize(wo + wi)
    half_ok = (vdot(wh, n) > 0.0) & (vdot(wo, wh) > 0.0) \
        & (vdot(wi, wh) > 0.0)
    d = _ggx_d(alpha, vdot(n, wh))
    g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i)
    has = m.carpaint_has_base_conductor > 0.0
    f0 = _carpaint_base_f0(m)
    f = vwhere(has,
               _fresnel_conductor(vdot(wi, wh), m.carpaint_base_eta,
                                  m.carpaint_base_k),
               _schlick_fresnel(base_color, vdot(wi, wh)))
    spec = f * (d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6))
    spec = _clamp_specular_tail(
        spec * _plastic_specular_tint(m)
        * jnp.maximum(1.0 - coat_avg, 0.0),
        roughness, f0, clamp_p)
    spec = vmaximum(spec, 0.0)
    use_spec = (spec_w > 1e-4) & half_ok
    combined = combined + vwhere(use_spec, spec * spec_w, zero)
    pdf_raw = _ggx_pdf(alpha, n, wo, wi)
    pdf_spec = jnp.where(use_spec & (pdf_raw > 0.0),
                         _clamp_specular_pdf(pdf_raw, clamp_p), 0.0)

    any_lobe = (diffuse_w > 1e-4) | (spec_w > 1e-4)
    ok = geo & any_lobe
    f_out = vwhere(ok, vmaximum(combined, 0.0), zero)
    pdf = jnp.where(ok, diffuse_w * pdf_diffuse + spec_w * pdf_spec, 0.0)
    return f_out, pdf


def _carpaint_lobe_probs(m: Mat):
    """(carpaint._lobe_probs twin)"""
    p_coat = jnp.clip(m.coat_sample_weight, 0.0, 0.95)
    p_flake = jnp.clip(m.carpaint_flake_sample_weight, 0.0, 0.95)
    p_base = jnp.maximum(1.0 - (p_coat + p_flake), 0.0)
    norm = p_coat + p_flake + p_base
    degenerate = norm <= 1e-6
    p_coat = jnp.where(degenerate, 0.0, p_coat)
    p_flake = jnp.where(degenerate, 0.0, p_flake)
    p_base = jnp.where(degenerate, 1.0, p_base)
    norm = jnp.where(degenerate, 1.0, norm)
    return p_coat / norm, p_flake / norm, p_base / norm


def _carpaint_eval(m: Mat, position: V3, n: V3, wo: V3, wi: V3,
                   clamp_p: Clamp):
    """(carpaint.evaluate_carpaint twin) -> (value V3, pdf)"""
    p_coat, p_flake, p_base = _carpaint_lobe_probs(m)
    coat_f, coat_pdf = _carpaint_eval_coat(m, n, wo, wi, clamp_p)
    flake_f, flake_pdf = _carpaint_eval_flake(m, position, n, wo, wi,
                                              clamp_p)
    base_f, base_pdf = _carpaint_eval_base(m, n, wo, wi, clamp_p)
    value = base_f * p_base + flake_f * p_flake + coat_f * p_coat
    pdf = p_base * base_pdf + p_flake * flake_pdf + p_coat * coat_pdf
    return value, pdf


def _sample_carpaint(m: Mat, position: V3, n: V3, wo: V3, state,
                     clamp_p: Clamp):
    """(carpaint.sample_carpaint twin; fused gate excludes specular_only).

    RNG: 1 lobe selector, then coat/flake draw 2 (VNDF) and base draws
    1 (sub-lobe choose) + 2 (VNDF or cosine); per-lane state follows the
    branch taken."""
    p_coat, p_flake, p_base = _carpaint_lobe_probs(m)

    state, r = _rand(state)
    threshold_coat = p_coat
    threshold_flake = p_coat + p_flake
    lobe = jnp.where((p_coat > 0.0) & (r < threshold_coat), 2.0,
                     jnp.where((p_flake > 0.0) & (r < threshold_flake),
                               1.0, 0.0))
    base_degenerate = p_base <= 1e-6
    fallback = jnp.where((p_flake > p_coat) & (p_flake > 0.0), 1.0,
                         jnp.where(p_coat > 0.0, 2.0, 0.0))
    lobe = jnp.where((lobe == 0.0) & base_degenerate, fallback, lobe)

    coat_roughness = jnp.maximum(jnp.clip(m.coat_roughness, 0.0, 1.0), 1e-3)
    fn = _flake_normal(m, position, n)
    flake_roughness = jnp.maximum(
        jnp.clip(m.carpaint_flake_roughness, 0.0, 1.0), 1e-3)

    # --- coat branch: 2 draws
    state_c, wh_c = _sample_ggx_vndf(n, wo, coat_roughness, state)
    wi_c = vsafe_normalize(vreflect(-wo, wh_c))
    coat_ok = vdot(wh_c, n) > 0.0

    # --- flake branch: 2 draws
    state_f, wh_f = _sample_ggx_vndf(fn, wo, flake_roughness, state)
    wi_f = vsafe_normalize(vreflect(-wo, wh_f))
    flake_ok = vdot(wh_f, fn) > 0.0

    # --- base branch: 1 + 2 draws
    metallic = jnp.clip(m.carpaint_base_metallic, 0.0, 1.0)
    diffuse_w = jnp.maximum(1.0 - metallic, 0.0)
    spec_w = jnp.maximum(metallic, 0.0)
    state_b, choose = _rand(state)
    sample_spec = (spec_w > 0.0) & ((diffuse_w + spec_w) > 0.0) & \
        (choose < spec_w / jnp.maximum(diffuse_w + spec_w, 1e-6))
    base_rough = jnp.maximum(
        jnp.clip(m.carpaint_base_roughness, 0.0, 1.0), 1e-3)
    state_bs, wh_b = _sample_ggx_vndf(n, wo, base_rough, state_b)
    wi_bs = vsafe_normalize(vreflect(-wo, wh_b))
    spec_ok = vdot(wh_b, n) > 0.0
    state_bd, local = _sample_cosine_hemisphere(state_b)
    wi_bd = vsafe_normalize(_to_world(local, n))
    wi_b = vwhere(sample_spec, wi_bs, wi_bd)
    state_b_final = jnp.where(sample_spec, state_bs, state_bd)
    # logical ops, not where: bool-valued select_n lowers to an i8->i1
    # truncation Mosaic rejects
    base_ok = jnp.logical_not(sample_spec) | spec_ok

    wi = vwhere(lobe == 2.0, wi_c, vwhere(lobe == 1.0, wi_f, wi_b))
    branch_ok = (((lobe == 2.0) & coat_ok)
                 | ((lobe == 1.0) & flake_ok)
                 | ((lobe < 0.5) & base_ok))
    new_state = jnp.where(lobe == 2.0, state_c,
                          jnp.where(lobe == 1.0, state_f, state_b_final))

    dir_ok = branch_ok & vfinite(wi) & (vdot(n, wi) > 0.0)

    coat_f, coat_pdf = _carpaint_eval_coat(m, n, wo, wi, clamp_p)
    flake_f, flake_pdf = _carpaint_eval_flake(m, position, n, wo, wi,
                                              clamp_p)
    base_f, base_pdf = _carpaint_eval_base(m, n, wo, wi, clamp_p)
    combined_pdf = (p_base * base_pdf + p_flake * flake_pdf
                    + p_coat * coat_pdf)

    sel_f = vwhere(lobe == 2.0, coat_f, vwhere(lobe == 1.0, flake_f,
                                               base_f))
    sel_pdf = jnp.where(lobe == 2.0, coat_pdf,
                        jnp.where(lobe == 1.0, flake_pdf, base_pdf))
    cos_i = jnp.maximum(vdot(n, wi), 0.0)
    weight = sel_f * (cos_i / jnp.maximum(combined_pdf, 1e-20))

    ok = (dir_ok & (combined_pdf > 0.0) & (sel_pdf > 0.0)
          & ((sel_f.x > 0.0) | (sel_f.y > 0.0) | (sel_f.z > 0.0))
          & (cos_i > 0.0) & vfinite(weight))

    lobe_type = jnp.where((lobe == 0.0) & jnp.logical_not(sample_spec),
                          0.0, 1.0)
    lobe_roughness = jnp.where(
        lobe == 2.0, coat_roughness,
        jnp.where(lobe == 1.0, flake_roughness,
                  jnp.where(sample_spec, base_rough, 1.0)))

    out = Sample.invalid(cos_i)
    out = out._replace(
        direction=vwhere(ok, wi, out.direction),
        weight=vwhere(ok, vmaximum(weight, 0.0), out.weight),
        pdf=jnp.where(ok, combined_pdf, 0.0),
        directional_pdf=jnp.where(ok, jnp.maximum(sel_pdf, 0.0), 0.0),
        lobe_type=jnp.where(ok, lobe_type, 0.0),
        lobe_roughness=jnp.where(ok, lobe_roughness, 0.0))
    return new_state, out


def _schlick_fresnel_scalar(f0, cos_theta):
    return f0 + (1.0 - f0) * _schlick_weight(cos_theta)


def _sss_sigma_a(m: Mat, base_color: V3, mean_free_path, anisotropy) -> V3:
    """(sss.sss_sigma_a twin)"""
    sigma_t = 1.0 / jnp.maximum(mean_free_path, 1e-4)
    sigma_s = _vclip(base_color, 0.0, 0.999) * sigma_t
    sigma_s = vmaximum(sigma_s, 0.0) * jnp.maximum(1.0 - anisotropy, 0.01)
    derived = vmaximum(V3(sigma_t, sigma_t, sigma_t) - sigma_s, 1e-6)
    override = m.sss_sigma_override > 0.5
    return vwhere(override, vmaximum(m.sss_sigma_a, 1e-6), derived)


def _sss_sigma_s_prime(m: Mat, base_color: V3, mean_free_path,
                       anisotropy) -> V3:
    """(sss.sss_sigma_s_prime twin)"""
    sigma_t = 1.0 / jnp.maximum(mean_free_path, 1e-4)
    derived = vmaximum(_vclip(base_color, 0.0, 0.999) * sigma_t, 0.0)
    override_s = vmaximum(m.sss_sigma_s, 0.0)
    override = m.sss_sigma_override > 0.5
    out = vwhere(override, override_s, derived)
    return out * jnp.maximum(1.0 - anisotropy, 0.01)


def _vclip(a: V3, lo, hi) -> V3:
    return V3(jnp.clip(a.x, lo, hi), jnp.clip(a.y, lo, hi),
              jnp.clip(a.z, lo, hi))


def _normalized_diffusion_profile(radius, sigma_a: V3,
                                  sigma_s_prime: V3) -> V3:
    """(sss.normalized_diffusion_profile twin)"""
    def per(sa, ss):
        sigma_t_prime = jnp.maximum(sa + ss, 1e-6)
        alpha_prime = jnp.clip(ss / sigma_t_prime, 0.0, 1.0)
        d = 1.0 / jnp.maximum(3.0 * sigma_t_prime, 1e-6)
        sigma_tr = jnp.sqrt(jnp.maximum(sa / d, 1e-6))
        r = jnp.maximum(radius, 1e-4)
        zr = 1.0 / sigma_t_prime
        dr = jnp.sqrt(r * r + zr * zr)
        vr = zr + 4.0 * d
        dv = jnp.sqrt(r * r + vr * vr)
        term_dr = (zr * (1.0 + sigma_tr * dr)) / jnp.maximum(dr ** 3, 1e-6)
        term_dv = (vr * (1.0 + sigma_tr * dv)) / jnp.maximum(dv ** 3, 1e-6)
        profile = (alpha_prime / (4.0 * PI)) * (
            term_dr * jnp.exp(-sigma_tr * dr)
            + term_dv * jnp.exp(-sigma_tr * dv))
        return jnp.maximum(profile, 0.0)

    return V3(per(sigma_a.x, sigma_s_prime.x),
              per(sigma_a.y, sigma_s_prime.y),
              per(sigma_a.z, sigma_s_prime.z))


def _sss_sigma_tr_scalar(sigma_a: V3, sigma_s_prime: V3):
    """(sss.sss_sigma_tr_scalar twin)"""
    def tr(sa, ss):
        sigma_t_prime = jnp.maximum(sa + ss, 1e-6)
        d = 1.0 / jnp.maximum(3.0 * sigma_t_prime, 1e-6)
        return jnp.sqrt(jnp.maximum(sa / d, 1e-6))

    return jnp.maximum(
        vluminance(V3(tr(sigma_a.x, sigma_s_prime.x),
                      tr(sigma_a.y, sigma_s_prime.y),
                      tr(sigma_a.z, sigma_s_prime.z))), 1e-4)


def _sss_lambert_fallback(m: Mat, n: V3, state):
    """(sss._lambert_fallback twin — 2 draws)"""
    state, local = _sample_cosine_hemisphere(state)
    wi = vsafe_normalize(_to_world(local, n))
    cos_i = vdot(n, wi)
    pdf = _lambert_pdf(n, wi)
    albedo = _material_base_color(m)
    weight = vmaximum(albedo * (1.0 / PI)
                      * (cos_i / jnp.maximum(pdf, 1e-20)), 0.0)
    ok = (cos_i > 0.0) & (pdf > 0.0) & vfinite(weight)
    out = Sample.invalid(cos_i)
    out = out._replace(
        direction=vwhere(ok, wi, out.direction),
        weight=vwhere(ok, weight, out.weight),
        pdf=jnp.where(ok, pdf, 0.0),
        directional_pdf=jnp.where(ok, pdf, 0.0),
        lobe_roughness=jnp.where(ok, 1.0, 0.0))
    return state, out


def _sample_subsurface(m: Mat, position: V3, n: V3, wo: V3, state,
                       clamp_p: Clamp, sss_mode: int):
    """(sss.sample_subsurface twin): separable normalized-diffusion
    BSSRDF (sss_mode==1) or lambert fallback; random-walk lanes
    (sss_mode==2, sss_method>=0.5) are overridden by the XLA pre-stage
    (see trace_paths_fused)."""
    mean_free_path = jnp.maximum(m.sss_mfp, 1e-4)
    if sss_mode != 1:
        return _sss_lambert_fallback(m, n, state)

    anisotropy = jnp.clip(m.sss_g, -0.99, 0.99)
    base_color = _material_base_color(m)
    sigma_a = _sss_sigma_a(m, base_color, mean_free_path, anisotropy)
    sigma_sp = _sss_sigma_s_prime(m, base_color, mean_free_path, anisotropy)
    sigma_tr = _sss_sigma_tr_scalar(sigma_a, sigma_sp)

    lane_separable = (m.sss_method < 0.5) & (mean_free_path > 1e-4) \
        & (sigma_tr > 0.0)

    # --- separable branch: 4 draws (radius, phi, 2x cosine)
    st = state
    st, u_r = _rand(st)
    u_r = jnp.clip(u_r, 1e-6, 1.0 - 1e-6)
    radius = -jnp.log(1.0 - u_r) / jnp.maximum(sigma_tr, 1e-4)
    radius = jnp.minimum(radius, mean_free_path * 10.0)
    pdf_radius = jnp.maximum(sigma_tr, 1e-4) * jnp.exp(
        -jnp.maximum(sigma_tr, 1e-4) * radius)
    st, u_phi = _rand(st)
    phi = 2.0 * PI * u_phi
    tangent, bitangent = _build_onb(n)
    disp_x = radius * jnp.cos(phi)
    disp_y = radius * jnp.sin(phi)
    exit_point = position + tangent * disp_x + bitangent * disp_y
    exit_normal = n

    st, local = _sample_cosine_hemisphere(st)
    wi = vsafe_normalize(_to_world(local, exit_normal))
    cos_exit = vdot(exit_normal, wi)
    pdf_dir = _lambert_pdf(exit_normal, wi)
    pdf_area = pdf_radius / (2.0 * PI * jnp.maximum(radius, 1e-4))

    profile = _normalized_diffusion_profile(radius, sigma_a, sigma_sp)
    coat_tint = _vclip01(m.coat_tint)
    coat_average = 1.0 - jnp.clip(m.coat_fresnel_avg, 0.0, 1.0)
    coat_ior = jnp.maximum(m.coat_ior, 1.0)
    f0 = ((coat_ior - 1.0) / (coat_ior + 1.0)) ** 2
    cos_in = jnp.maximum(vdot(n, wo), 0.0)
    trans_in = 1.0 - _schlick_fresnel_scalar(f0, cos_in)
    trans_out = 1.0 - _schlick_fresnel_scalar(f0, cos_exit)
    coat_transmission = jnp.clip(trans_in * trans_out, 0.0, 1.0)
    has_coat = m.sss_coat > 0.5
    profile = vwhere(has_coat, profile * coat_tint, profile)
    coat_trans_eff = jnp.where(has_coat, coat_transmission, 1.0)

    weight = profile * (cos_exit * coat_average * coat_trans_eff)
    denom = jnp.maximum(pdf_area * pdf_dir, 1e-6)
    weight = vmaximum(weight / denom, 0.0)
    sep_ok = (lane_separable & (pdf_radius > 0.0) & jnp.isfinite(pdf_radius)
              & (cos_exit > 0.0) & (pdf_dir > 0.0) & (pdf_area > 0.0)
              & vfinite(weight))

    sep = Sample.invalid(cos_exit)
    sep = sep._replace(
        direction=vwhere(sep_ok, wi, sep.direction),
        weight=vwhere(sep_ok, weight, sep.weight),
        pdf=jnp.where(sep_ok, denom, 0.0),
        directional_pdf=jnp.where(sep_ok, pdf_dir, 0.0),
        has_exit_point=sep_ok,
        exit_point=vwhere(sep_ok, exit_point, sep.exit_point),
        exit_normal=vwhere(sep_ok, exit_normal, sep.exit_normal))

    # --- lambert fallback branch: 2 draws
    fb_state, fb = _sss_lambert_fallback(m, n, state)
    out = _sel_sample(lane_separable, sep, fb)
    new_state = jnp.where(lane_separable, st, fb_state)
    return new_state, out


def _pbr_f0_from_ior(ior):
    eta = jnp.maximum(ior, 1.0)
    ratio = (eta - 1.0) / jnp.maximum(eta + 1.0, 1e-6)
    return jnp.clip(ratio * ratio, 0.0, 0.99)


def _pbr_transmission_tint(m: Mat, cos_theta) -> V3:
    thickness = jnp.maximum(m.pbr_thickness, 0.0)
    sigma_a = vmaximum(m.sigma_a, 0.0)
    distance = thickness / jnp.maximum(jnp.abs(cos_theta), 1e-3)

    def ch(s):
        return jnp.clip(jnp.exp(-s * distance), 0.0, 1.0)

    tint = V3(ch(sigma_a.x), ch(sigma_a.y), ch(sigma_a.z))
    skip = (thickness <= 0.0) | ((sigma_a.x <= 0.0) & (sigma_a.y <= 0.0)
                                 & (sigma_a.z <= 0.0))
    return vwhere(skip, vfull(thickness, 1.0, 1.0, 1.0), tint)


def _ggx_vndf_pdf(alpha, n: V3, wo: V3, wh: V3):
    cos_o = vdot(n, wo)
    cos_h = vdot(n, wh)
    d = _ggx_d(alpha, cos_h)
    g1 = _ggx_g1(alpha, cos_o)
    pdf = d * g1 * cos_h / jnp.maximum(vdot(wo, wh), 1e-6)
    return jnp.where((cos_o <= 0.0) | (cos_h <= 0.0), 0.0, pdf)


def _pbr_lobe_params(m: Mat, diffuse_occlusion):
    """(pbr._lobe_params twin; specular_only excluded by the fused gate)"""
    base_color = _material_base_color(m)
    metallic = jnp.clip(m.pbr_metallic, 0.0, 1.0)
    roughness = jnp.clip(m.roughness, 0.0, 1.0)
    f0d = _pbr_f0_from_ior(m.eta)
    f0 = V3(f0d + (base_color.x - f0d) * metallic,
            f0d + (base_color.y - f0d) * metallic,
            f0d + (base_color.z - f0d) * metallic)
    occ = jnp.clip(diffuse_occlusion, 0.0, 1.0)
    diffuse_color = base_color * ((1.0 - metallic) * occ)
    transmission = jnp.clip(m.pbr_transmission, 0.0, 1.0) * (1.0 - metallic)
    reflect_scale = 1.0 - transmission
    spec_weight_base = jnp.clip(vmax(f0), 0.05, 0.95)
    w_spec = spec_weight_base * reflect_scale
    w_diff = (1.0 - spec_weight_base) * reflect_scale
    w_trans = transmission
    weight_sum = w_spec + w_diff + w_trans
    safe = jnp.maximum(weight_sum, 1e-20)
    return (base_color, metallic, roughness, f0, diffuse_color, transmission,
            reflect_scale, w_spec / safe, w_diff / safe, w_trans / safe,
            weight_sum > 0.0)


def _eval_pbr(m: Mat, n: V3, wo: V3, wi: V3, clamp_p: Clamp,
              diffuse_occlusion):
    """(pbr.evaluate_pbr twin) -> (value V3, pdf, is_delta)"""
    cos_o = vdot(n, wo)
    cos_i = vdot(n, wi)
    abs_o = jnp.abs(cos_o)
    abs_i = jnp.abs(cos_i)
    geom_ok = (abs_o > 0.0) & (abs_i > 0.0)

    (_, _, roughness, f0, diffuse_color, transmission, reflect_scale,
     p_spec, p_diff, p_trans, weights_ok) = _pbr_lobe_params(
        m, diffuse_occlusion)
    is_delta = (m.mat_type == C.MATERIAL_PBR) & (roughness <= 1e-3)

    refl_side = (cos_o * cos_i > 0.0) & (cos_o > 0.0) & (cos_i > 0.0)
    alpha = jnp.maximum(roughness * roughness, 1e-4)
    wh = vsafe_normalize(wo + wi)
    half_ok = (vdot(wh, n) > 0.0) & (vdot(wo, wh) > 0.0) & (vdot(wi, wh) > 0.0)
    d = _ggx_d(alpha, vdot(n, wh))
    g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i)
    f = _schlick_fresnel(f0, vdot(wi, wh))
    spec = f * (d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6))
    spec = spec * _specular_energy_compensation(f0, roughness, abs_o)
    spec = _clamp_specular_tail(spec, roughness, f0, clamp_p)
    spec = spec * reflect_scale
    pdf_spec = _ggx_pdf(alpha, n, wo, wi)
    diffuse = diffuse_color * (reflect_scale / PI)
    pdf_diffuse = jnp.where(cos_i > 0.0, cos_i / PI, 0.0)
    pdf_refl = p_spec * pdf_spec + p_diff * pdf_diffuse
    refl_ok = refl_side & half_ok & (pdf_refl > 0.0)
    value_refl = vmaximum(spec + diffuse, 0.0)
    pdf_refl_c = _clamp_specular_pdf(pdf_refl, clamp_p)

    eta_t0 = jnp.maximum(m.eta, 1.0)
    inside = cos_o < 0.0
    eta_i = jnp.where(inside, eta_t0, 1.0)
    eta_t = jnp.where(inside, 1.0, eta_t0)
    eta = eta_i / eta_t
    wht = vsafe_normalize(wo + wi * eta)
    wht = vwhere(vdot(wht, n) <= 0.0, -wht, wht)
    cos_o_wh = vdot(wo, wht)
    cos_i_wh = vdot(wi, wht)
    dt = _ggx_d(alpha, jnp.maximum(vdot(n, wht), 0.0))
    gt = _ggx_g1(alpha, abs_o) * _ggx_g1(alpha, abs_i)
    fr, _ = _fresnel_dielectric_exact(cos_o_wh, eta_i, eta_t)
    denom = cos_o_wh + eta * cos_i_wh
    denom_sq = denom * denom
    factor = (eta * eta) * jnp.abs(cos_i_wh) * jnp.abs(cos_o_wh)
    factor = factor / jnp.maximum(abs_o * abs_i * denom_sq, 1e-6)
    ft = ((1.0 - fr) * dt * gt * factor) * _pbr_transmission_tint(m, abs_i)
    ft = ft * transmission
    pdf_wh = _ggx_vndf_pdf(alpha, n, wo, wht)
    dwh_dwi = jnp.abs((eta * eta * cos_i_wh) / jnp.maximum(denom_sq, 1e-8))
    pdf_trans = p_trans * pdf_wh * dwh_dwi
    trans_ok = ((cos_o * cos_i <= 0.0) & (transmission > 0.0)
                & vfinite(wht) & (vdot(wht, wht) > 0.0)
                & (cos_o_wh * cos_i_wh <= 0.0)
                & (jnp.abs(denom_sq) > 1e-8) & (pdf_trans > 0.0))
    value_trans = vmaximum(ft, 0.0)
    pdf_trans_c = _clamp_specular_pdf(pdf_trans, clamp_p)

    zero = jnp.zeros_like(cos_o)
    value = vfull(cos_o, 0.0, 0.0, 0.0)
    pdf = zero
    take_refl = geom_ok & weights_ok & refl_ok & jnp.logical_not(is_delta)
    take_trans = geom_ok & weights_ok & (cos_o * cos_i <= 0.0) & trans_ok \
        & jnp.logical_not(is_delta)
    value = vwhere(take_refl, value_refl, value)
    pdf = jnp.where(take_refl, pdf_refl_c, pdf)
    value = vwhere(take_trans, value_trans, value)
    pdf = jnp.where(take_trans, pdf_trans_c, pdf)
    return value, pdf, is_delta


def _sample_pbr(m: Mat, n: V3, wo: V3, incident: V3, state, clamp_p: Clamp,
                diffuse_occlusion):
    """(pbr.sample_pbr twin; identical RNG consumption)"""
    (_, _, roughness, f0, diffuse_color, transmission, reflect_scale,
     p_spec, p_diff, p_trans, weights_ok) = _pbr_lobe_params(
        m, diffuse_occlusion)
    smooth = roughness <= 1e-3
    alpha = jnp.maximum(roughness * roughness, 1e-4)

    state, choose = _rand(state)
    lobe_spec = choose < p_spec
    lobe_diff = jnp.logical_and(~lobe_spec, choose < p_spec + p_diff)
    lobe_trans = ~(lobe_spec | lobe_diff)

    cos_o = vdot(n, wo)
    abs_o = jnp.abs(cos_o)
    cos_o_pos = jnp.maximum(cos_o, 0.0)

    # specular: smooth mirror (0 draws)
    wi_sm = vreflect(incident, n)
    f_sm = _schlick_fresnel(f0, cos_o_pos) * reflect_scale
    ok_sm = vdot(n, wi_sm) > 0.0
    # specular: rough VNDF (2 draws)
    state_sr, wh = _sample_ggx_vndf(n, wo, roughness, state)
    wi_sr = vreflect(-wo, wh)
    cos_i_sr = vdot(n, wi_sr)
    d = _ggx_d(alpha, vdot(n, wh))
    g = _ggx_g1(alpha, cos_o_pos) * _ggx_g1(alpha, cos_i_sr)
    f_sr = _schlick_fresnel(f0, vdot(wi_sr, wh))
    f_sr = f_sr * (d * g / jnp.maximum(4.0 * cos_o_pos * cos_i_sr, 1e-6))
    f_sr = f_sr * _specular_energy_compensation(f0, roughness, cos_o_pos)
    f_sr = _clamp_specular_tail(f_sr, roughness, f0, clamp_p)
    f_sr = f_sr * reflect_scale
    pdf_spec_r = _ggx_pdf(alpha, n, wo, wi_sr)
    ok_sr = cos_i_sr > 0.0

    wi_s = vwhere(smooth, wi_sm, wi_sr)
    f_s = vwhere(smooth, f_sm, f_sr)
    pdf_spec = jnp.where(smooth, 1.0, pdf_spec_r)
    # logical ops, not where: Mosaic rejects vector i1 select_n
    # (trunci i8->i1) on current libtpu
    ok_s = (smooth & ok_sm) | (~smooth & ok_sr)
    state_s = jnp.where(smooth, state, state_sr)

    # diffuse: 2 draws
    state_d, local = _sample_cosine_hemisphere(state)
    wi_d = vsafe_normalize(_to_world(local, n))
    cos_i_d = vdot(n, wi_d)
    f_d = diffuse_color * (reflect_scale / PI)
    pdf_diffuse = jnp.where(cos_i_d > 0.0, cos_i_d / PI, 0.0)
    ok_d = cos_i_d > 0.0

    # transmission
    eta_t0 = jnp.maximum(m.eta, 1.0)
    inside = cos_o < 0.0
    eta_i = jnp.where(inside, eta_t0, 1.0)
    eta_t = jnp.where(inside, 1.0, eta_t0)
    eta = eta_i / eta_t
    # smooth: 0 draws
    wi_t0 = _vrefract(-wo, n, eta)
    len2_t0 = vdot(wi_t0, wi_t0)
    wi_t0n = wi_t0 * jax.lax.rsqrt(jnp.maximum(len2_t0, 1e-38))
    fr0, cos_t0 = _fresnel_dielectric_exact(cos_o, eta_i, eta_t)
    eta_scale = (eta_t * eta_t) / (eta_i * eta_i)
    dir_scale = eta_scale * (jnp.abs(cos_t0) / jnp.maximum(abs_o, 1e-6))
    ft0 = jnp.maximum(1.0 - fr0, 0.0) * dir_scale
    tint0 = _pbr_transmission_tint(m, jnp.abs(vdot(n, wi_t0n)))
    f_t0 = tint0 * (transmission * ft0)
    ok_t0 = len2_t0 > 0.0
    # rough: 2 draws
    state_tr, wh_t = _sample_ggx_vndf(n, wo, roughness, state)
    wi_tr = _vrefract(-wo, wh_t, eta)
    len2_tr = vdot(wi_tr, wi_tr)
    wi_trn = wi_tr * jax.lax.rsqrt(jnp.maximum(len2_tr, 1e-38))
    cos_i_tr = vdot(n, wi_trn)
    abs_i_tr = jnp.abs(cos_i_tr)
    cos_o_wh = vdot(wo, wh_t)
    cos_i_wh = vdot(wi_trn, wh_t)
    dt = _ggx_d(alpha, jnp.maximum(vdot(n, wh_t), 0.0))
    gt = _ggx_g1(alpha, abs_o) * _ggx_g1(alpha, abs_i_tr)
    frt, _ = _fresnel_dielectric_exact(cos_o_wh, eta_i, eta_t)
    denom = cos_o_wh + eta * cos_i_wh
    denom_sq = denom * denom
    factor = (eta * eta) * jnp.abs(cos_i_wh) * jnp.abs(cos_o_wh)
    factor = factor / jnp.maximum(abs_o * abs_i_tr * denom_sq, 1e-6)
    ftr = ((1.0 - frt) * dt * gt * factor) \
        * _pbr_transmission_tint(m, abs_i_tr)
    f_tr = ftr * transmission
    pdf_wh = _ggx_vndf_pdf(alpha, n, wo, wh_t)
    dwh_dwi = jnp.abs((eta * eta * cos_i_wh) / jnp.maximum(denom_sq, 1e-8))
    pdf_trans_r = pdf_wh * dwh_dwi
    ok_tr = ((len2_tr > 0.0) & (cos_i_tr * cos_o < 0.0)
             & (cos_o_wh * cos_i_wh <= 0.0) & (jnp.abs(denom_sq) > 1e-8))

    wi_t = vwhere(smooth, wi_t0n, wi_trn)
    f_t = vwhere(smooth, f_t0, f_tr)
    pdf_trans = jnp.where(smooth, 1.0, pdf_trans_r)
    ok_t = (smooth & ok_t0) | (~smooth & ok_tr)
    state_t = jnp.where(smooth, state, state_tr)

    wi = vwhere(lobe_spec, wi_s, vwhere(lobe_diff, wi_d, wi_t))
    f = vwhere(lobe_spec, f_s, vwhere(lobe_diff, f_d, f_t))
    branch_ok = ((lobe_spec & ok_s) | (lobe_diff & ok_d)
                 | (~lobe_spec & ~lobe_diff & ok_t))
    new_state = jnp.where(lobe_spec, state_s,
                          jnp.where(lobe_diff, state_d, state_t))
    is_delta = smooth & jnp.logical_not(lobe_diff)
    pdf_spec_sel = jnp.where(lobe_spec, pdf_spec, 0.0)
    pdf_diff_sel = jnp.where(lobe_diff, pdf_diffuse, 0.0)
    pdf_trans_sel = jnp.where(lobe_trans, pdf_trans, 0.0)
    pdf = (p_spec * pdf_spec_sel + p_diff * pdf_diff_sel
           + p_trans * pdf_trans_sel)

    cos_i = vdot(n, wi)
    abs_i = jnp.abs(cos_i)
    weight = vmaximum(f * (abs_i / jnp.maximum(pdf, 1e-20)), 0.0)
    ok = weights_ok & branch_ok & (abs_i > 0.0) & (pdf > 0.0) \
        & vfinite(weight)

    lobe_type = jnp.where(lobe_spec, 1.0, jnp.where(lobe_diff, 0.0, 2.0))
    lobe_roughness = jnp.where(lobe_diff, 1.0, roughness)

    out = Sample.invalid(pdf)
    out = out._replace(
        direction=vwhere(ok, wi, out.direction),
        weight=vwhere(ok, weight, out.weight),
        pdf=jnp.where(ok, pdf, 0.0),
        directional_pdf=jnp.where(ok, pdf, 0.0),
        is_delta=ok & is_delta,
        lobe_type=jnp.where(ok, lobe_type, 0.0),
        lobe_roughness=jnp.where(ok, lobe_roughness, 0.0))
    return new_state, out


def _evaluate_bsdf(m: Mat, n: V3, wo: V3, wi: V3, clamp_p: Clamp,
                   diffuse_occlusion, types, position: V3 = None):
    """(bsdf.evaluate_bsdf twin for the fused type set)
    -> (value V3, pdf, is_delta, is_bssrdf)"""
    cos_o = jnp.maximum(vdot(n, wo), 0.0)
    cos_i = jnp.maximum(vdot(n, wi), 0.0)
    geom_ok = (cos_i > 0.0) & (cos_o > 0.0)

    value = vfull(cos_o, 0.0, 0.0, 0.0)
    pdf = jnp.zeros_like(cos_o)
    is_delta = jnp.zeros_like(cos_o, dtype=bool)
    is_bssrdf = jnp.zeros_like(cos_o, dtype=bool)

    if C.MATERIAL_LAMBERTIAN in types:
        mask = (m.mat_type == C.MATERIAL_LAMBERTIAN) & geom_ok
        occ = jnp.clip(diffuse_occlusion, 0.0, 1.0)
        albedo = _material_base_color(m) * occ
        v = albedo * (1.0 / PI)
        p = jnp.where(cos_i > 0.0, cos_i / PI, 0.0)
        value = vwhere(mask, v, value)
        pdf = jnp.where(mask, p, pdf)

    if C.MATERIAL_METAL in types:
        rough = jnp.clip(m.roughness, 0.0, 1.0)
        smooth = rough <= 1e-3
        mask = (m.mat_type == C.MATERIAL_METAL) & geom_ok
        is_delta = is_delta | (mask & smooth)
        alpha = rough * rough
        wh = vsafe_normalize(wo + wi)
        half_ok = (vdot(wh, n) > 0.0) & (vdot(wo, wh) > 0.0) \
            & (vdot(wi, wh) > 0.0)
        d = _ggx_d(alpha, vdot(n, wh))
        g = _ggx_g1(alpha, cos_o) * _ggx_g1(alpha, cos_i)
        f0 = _conductor_f0(m)
        f = vwhere(_has_conductor_ior(m),
                   _fresnel_conductor(vdot(wi, wh), m.conductor_eta,
                                      m.conductor_k),
                   _schlick_fresnel(f0, vdot(wi, wh)))
        spec = f * (d * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6))
        spec = spec * _specular_energy_compensation(f0, rough, cos_o)
        spec = _clamp_specular_tail(spec, rough, f0, clamp_p)
        p_raw = _ggx_pdf(alpha, n, wo, wi)
        p_c = _clamp_specular_pdf(p_raw, clamp_p)
        valid = mask & (~smooth) & half_ok & (p_raw > 0.0)
        value = vwhere(valid, vmaximum(spec, 0.0), value)
        pdf = jnp.where(valid, p_c, pdf)

    if C.MATERIAL_DIELECTRIC in types:
        is_delta = is_delta | (m.mat_type == C.MATERIAL_DIELECTRIC)

    if C.MATERIAL_PLASTIC in types:
        mask = (m.mat_type == C.MATERIAL_PLASTIC) & geom_ok
        vv, pp = _plastic_eval(m, n, wo, wi, clamp_p, diffuse_occlusion,
                               cos_o, cos_i)
        value = vwhere(mask, vv, value)
        pdf = jnp.where(mask, pp, pdf)

    if C.MATERIAL_SUBSURFACE in types:
        is_bssrdf = is_bssrdf | (m.mat_type == C.MATERIAL_SUBSURFACE)

    if C.MATERIAL_CARPAINT in types:
        mask = (m.mat_type == C.MATERIAL_CARPAINT) & geom_ok
        vv, pp = _carpaint_eval(m, position, n, wo, wi, clamp_p)
        value = vwhere(mask, vv, value)
        pdf = jnp.where(mask, pp, pdf)

    if C.MATERIAL_PBR in types:
        mask = (m.mat_type == C.MATERIAL_PBR) & geom_ok
        vv, pp, dd = _eval_pbr(m, n, wo, wi, clamp_p, diffuse_occlusion)
        value = vwhere(mask, vv, value)
        pdf = jnp.where(mask, pp, pdf)
        is_delta = (mask & dd) | (~mask & is_delta)

    bad = (pdf <= 0.0) | jnp.logical_not(vfinite(value))
    value = vwhere(bad, vfull(pdf, 0.0, 0.0, 0.0), value)
    return value, pdf, is_delta, is_bssrdf


def _sample_bsdf(m: Mat, n: V3, wo: V3, incident: V3, front_face, state,
                 clamp_p: Clamp, types, diffuse_occlusion=None,
                 position: V3 = None, sss_mode: int = 0) -> tuple:
    """(bsdf.sample_bsdf twin for the fused type set)"""
    out = Sample.invalid(m.roughness)
    new_state = state
    if diffuse_occlusion is None:
        diffuse_occlusion = jnp.ones_like(m.roughness)

    def merge(type_id, s, o):
        nonlocal out, new_state
        mask = m.mat_type == type_id
        out = _sel_sample(mask, o, out)
        new_state = jnp.where(mask, s, new_state)

    if C.MATERIAL_LAMBERTIAN in types:
        s, o = _sample_lambert(m, n, state, diffuse_occlusion)
        merge(C.MATERIAL_LAMBERTIAN, s, o)
    if C.MATERIAL_METAL in types:
        s, o = _sample_metal(m, n, wo, incident, state, clamp_p)
        merge(C.MATERIAL_METAL, s, o)
    if C.MATERIAL_DIELECTRIC in types:
        s, o = _sample_dielectric(m, n, incident, front_face, state)
        merge(C.MATERIAL_DIELECTRIC, s, o)
    if C.MATERIAL_PLASTIC in types:
        s, o = _sample_plastic(m, n, wo, state, clamp_p, diffuse_occlusion)
        merge(C.MATERIAL_PLASTIC, s, o)
    if C.MATERIAL_SUBSURFACE in types:
        s, o = _sample_subsurface(m, position, n, wo, state, clamp_p,
                                  sss_mode)
        merge(C.MATERIAL_SUBSURFACE, s, o)
    if C.MATERIAL_CARPAINT in types:
        s, o = _sample_carpaint(m, position, n, wo, state, clamp_p)
        merge(C.MATERIAL_CARPAINT, s, o)
    if C.MATERIAL_PBR in types:
        s, o = _sample_pbr(m, n, wo, incident, state, clamp_p,
                           diffuse_occlusion)
        merge(C.MATERIAL_PBR, s, o)
    return new_state, out


# ---------------------------------------------------------------------------
# The kernels
#
# Three stages share one body generator:
#   "full" — whole shade stage in one kernel (no NEE configs)
#   "s1"   — pre-NEE: hit reconstruction, miss/background (+env MIS),
#            medium absorption, material (+texture overrides), AOVs,
#            emissive, env-NEE RNG draws -> transients
#   "s2"   — post-NEE: env NEE eval/MIS add (given alias-stage results +
#            shadow-trace occlusion), BSDF sample, medium stack, RR, commit
# ---------------------------------------------------------------------------

#: transient planes S1 -> S2 (values not recomputable in S2); u4-u6 are
#: the environment draws when rect and env NEE run together (rect draws
#: come first, matching the XLA body's draw order)
TRANS = ["u1", "u2", "u3", "lrough", "snx", "sny", "snz",
         "nfx", "nfy", "nfz", "px", "py", "pz", "active", "delta",
         "u4", "u5", "u6"]
TRANS_IDX = {n: i for i, n in enumerate(TRANS)}

#: random-walk SSS override planes (XLA pre-stage -> S2/full kernel):
#: the walk traces the scene per step, so it cannot live in the kernel;
#: lanes with mask & pdf>0 replace their sampled lobe wholesale
#: (integrator :538-547)
RW = ["mask", "dx", "dy", "dz", "wr", "wg", "wb", "pdf", "dpdf",
      "lobe", "lrough", "hasexit", "ex", "ey", "ez", "enx", "eny", "enz"]
RW_IDX = {n: i for i, n in enumerate(RW)}

#: NEE sample-stage results + occlusion, XLA -> S2 (one bank per light
#: integral: rect esmp rides bank 0 and env bank 1 when both run)
ESMP = ["edx", "edy", "edz", "err", "erg", "erb", "epdf", "evalid", "occl"]
ESMP_IDX = {n: i for i, n in enumerate(ESMP)}

#: spec-NEE/MNEE chain exports, S2 -> XLA (specnee.delta_chain_estimators;
#: direction/is_delta/specular_depth/next_origin ride the committed carry)
CHAIN = ["wr", "wg", "wb", "dpdf", "medev", "active", "front"]
CHAIN_IDX = {n: i for i, n in enumerate(CHAIN)}

#: XLA texture-stage override planes (apply_pbr_textures outputs).
#: tnx-tnz carry the (possibly normal-mapped) shading normal, ttrans the
#: textured transmission, tpbr the PBR-triangle lane flag that scopes the
#: normal override (non-PBR lanes keep the kernel's own reconstruction).
TEX = ["tbr", "tbg", "tbb", "trough", "tmetal",
       "temr", "temg", "temb", "tocc", "tpass",
       "tnx", "tny", "tnz", "ttrans", "tpbr"]
TEX_IDX = {n: i for i, n in enumerate(TEX)}


def _environment_lighting_roughness(m: Mat, types):
    """(bsdf.environment_lighting_roughness twin for the fused type set)"""
    rough = jnp.clip(m.roughness, 0.0, 1.0)
    out = jnp.ones_like(rough)
    if C.MATERIAL_METAL in types or C.MATERIAL_PBR in types:
        out = jnp.where((m.mat_type == C.MATERIAL_METAL)
                        | (m.mat_type == C.MATERIAL_PBR), rough, out)
    if C.MATERIAL_PLASTIC in types:
        coat_r = jnp.maximum(jnp.clip(m.coat_roughness, 0.0, 1.0), 1e-3)
        out = jnp.where(m.mat_type == C.MATERIAL_PLASTIC,
                        jnp.clip(coat_r, 0.0, 1.0), out)
    if C.MATERIAL_CARPAINT in types:
        out = jnp.where(m.mat_type == C.MATERIAL_CARPAINT,
                        jnp.clip(m.carpaint_base_roughness, 0.0, 1.0), out)
    return out


def _shade_kernel(*refs, stage, layout, static, m_count, env_mode, has_tex,
                  has_prims=False, rect_nee=False, chains=False,
                  has_emod=False, has_rw=False):
    """One stage of the fused shade (see module docstring for the split).

    has_prims: scene contains analytic spheres/rects — non-triangle hit
    lanes ride the same rows planes with flags in the spare columns
    (20 = geometric two_sided, 21 = is_triangle) and take the XLA
    hit_spheres/hit_rects normal path exactly (raw normal in the n0
    columns, NO renormalization — bit-parity with intersect.py).

    rect_nee: scene has emissive rectangles — the same S1/shadow/S2 split
    as env NEE, with the XLA host sampling the rect light from the
    exported u1-u3 draws. Without env_mode the envpdf input slot carries
    _rect_light_pdf_for_hit for the emissive-hit MIS weight; WITH
    env_mode (rect + env NEE together, integrator runs both blocks) a
    separate rectpdf input carries it, S1 exports the env draws as
    u4-u6, and S2 commits two esmp banks (rect then env — the XLA body's
    radiance add order).

    has_emod: DIFFUSE_LIGHT emission is env-modulated (emission_env
    materials under an environment background) — an XLA pre-stage
    computes environment_color(-shading_normal) per lane and the
    emissive-hit block multiplies it in (integrator body ~:435-442)."""
    L = layout
    types = set(static.material_types)
    both_nee = rect_nee and env_mode

    # --- parse the positional ref list (mirrors _shade_call's order) ----
    it = iter(refs)
    mat_ref = next(it)
    scal_ref = next(it)
    carry_ref = next(it)
    state_ref = next(it)
    t_ref = next(it)
    tri_ref = next(it)
    u_ref = next(it)
    v_ref = next(it)
    row_ref = next(it)
    envbg_ref = next(it) if (env_mode and stage in ("s1",)) else None
    envpdf_ref = next(it) if ((env_mode or rect_nee)
                              and stage in ("s1",)) else None
    rectpdf_ref = next(it) if (both_nee and stage in ("s1",)) else None
    emod_ref = next(it) if (has_emod and stage in ("s1",)) else None
    trans_in_ref = next(it) if stage == "s2" else None
    esmp_ref = next(it) if stage == "s2" else None
    rw_ref = next(it) if has_rw else None
    rw_state_ref = next(it) if has_rw else None
    tex_ref = next(it) if has_tex else None
    out_ref = next(it)
    ostate_ref = next(it)
    trans_out_ref = next(it) if stage == "s1" else None
    chain_ref = next(it) if (chains and stage == "s2") else None
    chain_state_ref = next(it) if (chains and stage == "s2") else None

    def ld(name):
        return carry_ref[L[name], 0]

    def ldv(names):
        a, b, c = names
        return V3(ld(a), ld(b), ld(c))

    def st(name, val):
        out_ref[L[name], 0] = val

    def stv(names, v: V3):
        a, b, c = names
        out_ref[L[a], 0] = v.x
        out_ref[L[b], 0] = v.y
        out_ref[L[c], 0] = v.z

    def scal(name):
        return scal_ref[SCAL_IDX[name]]

    def trans_in(name):
        return trans_in_ref[TRANS_IDX[name], 0]

    def trans_out(name, val):
        trans_out_ref[TRANS_IDX[name], 0] = val

    def tex(name):
        return tex_ref[TEX_IDX[name], 0]

    def esmp(name, bank=0):
        return esmp_ref[bank * len(ESMP) + ESMP_IDX[name], 0]

    clamp_p = Clamp(
        factor=scal("clamp_factor"), floor=scal("clamp_floor"),
        throughput=scal("throughput_clamp"), tail_base=scal("spec_tail_base"),
        tail_rough=scal("spec_tail_rough"),
        min_spec_pdf=scal("min_spec_pdf"),
        max_contribution=scal("max_contribution"),
        enabled=scal("clamp_enabled"))
    depth = scal("depth")

    alive0 = ld("alive") > 0.5
    state0 = state_ref[0]
    ray_o = ldv(("ox", "oy", "oz"))
    ray_d = ldv(("dx", "dy", "dz"))
    throughput0 = ldv(("tpr", "tpg", "tpb"))
    radiance = ldv(("rr", "rg", "rb"))

    t_hit = t_ref[0]
    tri = tri_ref[0]
    bu = u_ref[0]
    bv = v_ref[0]
    hit = tri >= 0.0
    zero3 = vfull(t_hit, 0.0, 0.0, 0.0)

    # ---- hit reconstruction (traversal._hit_record_from_best twin) -----
    def rowv(i):
        return V3(row_ref[i, 0], row_ref[i + 1, 0], row_ref[i + 2, 0])

    tv0 = rowv(0)
    tv1 = rowv(3)
    tv2 = rowv(6)
    mid = row_ref[18, 0]
    mesh_idx = row_ref[19, 0]
    geo_n = vsafe_normalize(vcross(tv1 - tv0, tv2 - tv0))
    front = vdot(ray_d, geo_n) < 0.0
    n_faced = vwhere(front, geo_n, -geo_n)
    if has_prims:
        # rows col 21 flavor: 1 = plain triangle (full reconstruction),
        # 0 = analytic sphere/rect (raw normal in n0 cols, XLA
        # hit_spheres/hit_rects semantics), 2 = precomputed (instanced
        # triangles: raw geo normal in n0 cols, FINAL shading normal
        # passthrough in the n1 cols — trace_instanced computed it)
        flavor = row_ref[21, 0]
        is_tri = flavor > 0.5           # triangle prev-id semantics
        plain_tri = is_tri & (flavor < 1.5)
        precomp = flavor > 1.5
        two_sided_geo = row_ref[20, 0] > 0.5
        raw_n = rowv(9)
        front_nt = vdot(ray_d, raw_n) < 0.0
        nf_nt = vwhere(front_nt, raw_n, -raw_n)
        # logical ops, not where: bool-valued select_n lowers to an i8->i1
        # trunci this runtime's Mosaic rejects (BENCHMARKS.md tunnel notes)
        front = (plain_tri & front) | (~plain_tri & front_nt)
        n_faced = vwhere(plain_tri, n_faced, nf_nt)
    else:
        is_tri = None
        plain_tri = None
        precomp = None
        two_sided_geo = None

    if stage == "s2":
        shading_normal = V3(trans_in("snx"), trans_in("sny"), trans_in("snz"))
        n_faced = V3(trans_in("nfx"), trans_in("nfy"), trans_in("nfz"))
        point = V3(trans_in("px"), trans_in("py"), trans_in("pz"))
    else:
        tn0 = rowv(9)
        tn1 = rowv(12)
        tn2 = rowv(15)
        w0 = jnp.maximum(1.0 - bu - bv, 0.0)
        w1 = jnp.maximum(bu, 0.0)
        w2 = jnp.maximum(bv, 0.0)
        w_sum = w0 + w1 + w2
        has_w = w_sum > 1e-8
        inv_w = 1.0 / jnp.where(has_w, w_sum, 1.0)
        w0 = jnp.where(has_w, w0 * inv_w, 1.0)
        w1 = jnp.where(has_w, w1 * inv_w, 0.0)
        w2 = jnp.where(has_w, w2 * inv_w, 0.0)
        sn = tn0 * w0 + tn1 * w1 + tn2 * w2
        sn_ok = vfinite(sn) & (vdot(sn, sn) > 0.0)
        sn = vwhere(vdot(sn, n_faced) < 0.0, -sn, sn)
        sn = vsafe_normalize(sn)
        shading_normal = vwhere(sn_ok, sn, n_faced)
        if has_prims:
            # spheres/rects: shading normal IS the faceforwarded raw
            # normal (no interpolation/renormalization — intersect.py);
            # instanced: the XLA-computed shading normal passes through
            shading_normal = vwhere(
                plain_tri, shading_normal,
                vwhere(precomp, tn1, n_faced))
        point = ray_o + ray_d * t_hit

    # ---- material fetch (+ texture-stage overrides) --------------------
    m = _fetch_material(mat_ref, jnp.clip(mid, 0.0, float(m_count - 1)),
                        m_count)
    diffuse_occlusion = jnp.ones_like(t_hit)
    pbr_emissive = m.emission
    passthrough = jnp.zeros_like(hit)
    if has_tex:
        # Per-lane select on the tpbr flag plane: only textured-PBR lanes
        # take the XLA texture-stage override; everything else keeps the
        # kernel's own SMEM material fetch. This lets the identity branch
        # of _texture_dispatch emit ZERO planes (a broadcast) instead of
        # a full-width gather_material — the identity branch runs for
        # every chunk x depth, so its per-lane gathers were a measured
        # frame-level cost (BENCHMARKS round-5 budget). Values are
        # unchanged: non-textured lanes' tex planes were exactly the
        # material-table values this select now reads directly.
        tv = tex("tpbr") > 0.5
        m = m._replace(
            base=vwhere(tv, V3(tex("tbr"), tex("tbg"), tex("tbb")),
                        m.base),
            roughness=jnp.where(tv, tex("trough"), m.roughness),
            pbr_metallic=jnp.where(tv, tex("tmetal"), m.pbr_metallic),
            pbr_transmission=jnp.where(tv, tex("ttrans"),
                                       m.pbr_transmission))
        # fallback emissive matches apply_pbr_textures' non-textured
        # lanes: to_working_space(m.emission) (pbr_textures.py:180,363)
        fb_em = (to_acescg(m.emission)
                 if static.working_color_space == 1 else m.emission)
        pbr_emissive = vwhere(tv, V3(tex("temr"), tex("temg"), tex("temb")),
                              fb_em)
        diffuse_occlusion = jnp.where(tv, tex("tocc"), diffuse_occlusion)
        passthrough = tv & (tex("tpass") > 0.5)
        if stage != "s2":
            # normal-mapped shading normal (integrator: shading_normal =
            # texd.shading_normal, applied before the dielectric force);
            # S2 reads the final normal from the S1 transients instead
            shading_normal = vwhere(tex("tpbr") > 0.5,
                                    V3(tex("tnx"), tex("tny"), tex("tnz")),
                                    shading_normal)
    incident = vnormalize(ray_d)
    wo = -incident
    if C.MATERIAL_DIELECTRIC in types:
        shading_normal = vwhere(m.mat_type == C.MATERIAL_DIELECTRIC,
                                n_faced, shading_normal)

    active = alive0 & hit

    if stage in ("full", "s1"):
        # ---- miss: background (integrator body) ------------------------
        miss = alive0 & jnp.logical_not(hit)
        if env_mode:
            background = V3(envbg_ref[0, 0], envbg_ref[1, 0],
                            envbg_ref[2, 0])
        elif static.background_mode == 1:
            background = V3(jnp.ones_like(t_hit) * scal("bg_r"),
                            jnp.ones_like(t_hit) * scal("bg_g"),
                            jnp.ones_like(t_hit) * scal("bg_b"))
        else:
            unit = vnormalize(ray_d)
            tt = 0.5 * (unit.y + 1.0)
            background = V3(1.0 + (0.5 - 1.0) * tt, 1.0 + (0.7 - 1.0) * tt,
                            jnp.ones_like(tt))
        if static.working_color_space == 1 and not env_mode:
            background = to_acescg(background)
        mis_weight = jnp.ones_like(t_hit)
        if env_mode:
            use_specular_mis = jnp.logical_or(
                jnp.logical_not(ld("last_delta") > 0.5),
                static.enable_specular_nee or static.enable_mnee)
            light_pdf = envpdf_ref[0]
            last_pdf0 = ld("last_pdf")
            denom = last_pdf0 + light_pdf
            wmis = jnp.clip(last_pdf0 / jnp.maximum(denom, 1e-30),
                            C.MIS_WEIGHT_CLAMP_MIN, C.MIS_WEIGHT_CLAMP_MAX)
            mis_weight = jnp.where(use_specular_mis & (denom > 0.0),
                                   wmis, mis_weight)
        bg_contrib = _clamp_firefly(throughput0, background * mis_weight,
                                    clamp_p)
        radiance = radiance + vwhere(miss, bg_contrib, zero3)

        # ---- medium absorption (Beer–Lambert) --------------------------
        if L.has_medium:
            med_depth = ld("med_depth")
            in_medium = active & (med_depth > 0.5)
            top = jnp.clip(med_depth - 1.0, 0.0, float(L.med_slots - 1))
            sigma = zero3
            for s in range(L.med_slots):
                sigma = vwhere(jnp.abs(top - float(s)) < 0.5,
                               ldv((f"med{s}r", f"med{s}g", f"med{s}b")),
                               sigma)
            segment = jnp.maximum(t_hit, 0.0)
            att = V3(jnp.exp(-sigma.x * segment),
                     jnp.exp(-sigma.y * segment),
                     jnp.exp(-sigma.z * segment))
            has_sigma = (sigma.x > 0.0) | (sigma.y > 0.0) | (sigma.z > 0.0)
            throughput = vwhere(in_medium & has_sigma, throughput0 * att,
                                throughput0)
        else:
            throughput = throughput0

        # ---- first-hit AOVs --------------------------------------------
        first_hit = ld("first_hit") > 0.5
        record_aov = active & first_hit & jnp.logical_not(passthrough)
        aov_albedo = vwhere(record_aov, _material_base_color(m),
                            ldv(("aar", "aag", "aab")))
        aov_normal = vwhere(record_aov, shading_normal,
                            ldv(("anx", "any", "anz")))
        first_hit_next = first_hit & jnp.logical_not(
            active & jnp.logical_not(passthrough))

        # ---- PBR emissive additive -------------------------------------
        # geometric two_sided: spheres always, rects per-SoA (rows col 20)
        two_sided = two_sided_geo if has_prims else jnp.zeros_like(front)
        if C.MATERIAL_PBR in types:
            two_sided = two_sided | ((m.mat_type == C.MATERIAL_PBR)
                                     & (m.pbr_double_sided > 0.5))
            has_em = (pbr_emissive.x != 0.0) | (pbr_emissive.y != 0.0) \
                | (pbr_emissive.z != 0.0)
            pbr_emit = (active & jnp.logical_not(passthrough)
                        & (m.mat_type == C.MATERIAL_PBR) & has_em
                        & (front | two_sided))
            contrib = _clamp_firefly(throughput, pbr_emissive, clamp_p)
            radiance = radiance + vwhere(pbr_emit, contrib, zero3)

        # ---- DiffuseLight hit -> emit, terminate -----------------------
        light_hit = active & (m.mat_type == C.MATERIAL_DIFFUSE_LIGHT)
        if C.MATERIAL_DIFFUSE_LIGHT in types:
            emission = m.emission
            if has_emod:
                # env-modulated emission (integrator body ~:435-442): the
                # XLA pre-stage computed environment_color(-shading_normal)
                emod = V3(emod_ref[0, 0], emod_ref[1, 0], emod_ref[2, 0])
                use_env = (m.emission_env > 0.0) & front
                emission = vwhere(use_env, emission * emod, emission)
            has_em = (emission.x != 0.0) | (emission.y != 0.0) \
                | (emission.z != 0.0)
            emit_ok = has_em & (front | two_sided)
            l_mis = jnp.ones_like(t_hit)
            if rect_nee:
                # emissive-hit MIS vs the rect-light pdf of THIS hit
                # (integrator: _rect_light_pdf_for_hit; rides the envpdf
                # slot rect-only, its own slot when env NEE also runs)
                use_specular_mis = jnp.logical_or(
                    jnp.logical_not(ld("last_delta") > 0.5),
                    static.enable_specular_nee or static.enable_mnee)
                light_pdf = rectpdf_ref[0] if both_nee else envpdf_ref[0]
                last_pdf0 = ld("last_pdf")
                denom = last_pdf0 + light_pdf
                wmis = jnp.clip(last_pdf0 / jnp.maximum(denom, 1e-30),
                                C.MIS_WEIGHT_CLAMP_MIN,
                                C.MIS_WEIGHT_CLAMP_MAX)
                l_mis = jnp.where(use_specular_mis & (denom > 0.0),
                                  wmis, l_mis)
            add = light_hit & emit_ok
            contrib = _clamp_firefly(throughput, emission * l_mis, clamp_p)
            radiance = radiance + vwhere(add, contrib, zero3)
        active = active & jnp.logical_not(light_hit)
    else:
        # S2 recomputes post-light active & throughput written by S1
        active = trans_in("active") > 0.5
        throughput = throughput0      # S1 stored the attenuated value
        first_hit_next = None

    if stage == "s1":
        # ---- NEE draws (3 per light integral; rect first, then env —
        # the XLA body's draw order) --------------------------------------
        surface_is_delta = _material_is_delta(m)
        nee_lanes = (active & jnp.logical_not(surface_is_delta)
                     & jnp.logical_not(passthrough))
        s_env = state0
        s_env, u1 = _rand(s_env)
        s_env, u2 = _rand(s_env)
        s_env, u3 = _rand(s_env)
        if both_nee:
            s_env, u4 = _rand(s_env)
            s_env, u5 = _rand(s_env)
            s_env, u6 = _rand(s_env)
        else:
            u4 = u5 = u6 = jnp.zeros_like(u1)
        state1 = jnp.where(nee_lanes, s_env, state0)

        keep = alive0
        ostate_ref[0] = jnp.where(keep, state1, state0)
        # carry: radiance adds, attenuated throughput, AOVs, first-hit
        stv(("rr", "rg", "rb"),
            vwhere(keep, radiance, ldv(("rr", "rg", "rb"))))
        stv(("tpr", "tpg", "tpb"),
            vwhere(keep, throughput, throughput0))
        stv(("aar", "aag", "aab"),
            vwhere(keep, aov_albedo, ldv(("aar", "aag", "aab"))))
        stv(("anx", "any", "anz"),
            vwhere(keep, aov_normal, ldv(("anx", "any", "anz"))))
        st("first_hit", jnp.where(keep,
                                  jnp.where(first_hit_next, 1.0, 0.0),
                                  ld("first_hit")))
        # untouched planes pass through
        for nm in L.names:
            if nm in ("rr", "rg", "rb", "tpr", "tpg", "tpb",
                      "aar", "aag", "aab", "anx", "any", "anz",
                      "first_hit"):
                continue
            st(nm, ld(nm))
        # transients
        trans_out("u1", u1)
        trans_out("u2", u2)
        trans_out("u3", u3)
        trans_out("lrough", _environment_lighting_roughness(m, types))
        trans_out("snx", shading_normal.x)
        trans_out("sny", shading_normal.y)
        trans_out("snz", shading_normal.z)
        trans_out("nfx", n_faced.x)
        trans_out("nfy", n_faced.y)
        trans_out("nfz", n_faced.z)
        trans_out("px", point.x)
        trans_out("py", point.y)
        trans_out("pz", point.z)
        trans_out("active", jnp.where(active, 1.0, 0.0))
        trans_out("delta", jnp.where(surface_is_delta, 1.0, 0.0))
        trans_out("u4", u4)
        trans_out("u5", u5)
        trans_out("u6", u6)
        return

    if stage == "s2":
        # ---- NEE contributions (integrator body rect + env sections;
        # one esmp bank per light integral, rect first) -------------------
        surface_is_delta = trans_in("delta") > 0.5
        nee_lanes = (active & jnp.logical_not(surface_is_delta)
                     & jnp.logical_not(passthrough))
        for bank in range(2 if both_nee else 1):
            e_dir = V3(esmp("edx", bank), esmp("edy", bank),
                       esmp("edz", bank))
            e_radiance = V3(esmp("err", bank), esmp("erg", bank),
                            esmp("erb", bank))
            e_pdf = esmp("epdf", bank)
            e_valid = esmp("evalid", bank) > 0.5
            occluded = esmp("occl", bank) > 0.5
            n_dot_l = jnp.maximum(vdot(shading_normal, e_dir), 0.0)
            do_shadow = nee_lanes & e_valid & (e_pdf > 0.0) & (n_dot_l > 0.0)
            ev_value, ev_pdf, ev_delta, ev_bssrdf = _evaluate_bsdf(
                m, shading_normal, wo, e_dir, clamp_p, diffuse_occlusion,
                types, position=point)
            max_comp = vmax(ev_value)
            wmis = jnp.ones_like(e_pdf)
            denom = e_pdf + ev_pdf
            wmis = jnp.where(ev_pdf > 0.0,
                             jnp.clip(e_pdf / jnp.maximum(denom, 1e-30),
                                      C.MIS_WEIGHT_CLAMP_MIN,
                                      C.MIS_WEIGHT_CLAMP_MAX), wmis)
            contribution = (e_radiance * ev_value
                            * (n_dot_l * wmis / jnp.maximum(e_pdf, 1e-30)))
            add = (do_shadow & jnp.logical_not(occluded)
                   & jnp.logical_not(ev_delta)
                   & jnp.logical_not(ev_bssrdf)
                   & (max_comp > 0.0) & vfinite(contribution))
            clamped = _clamp_firefly(throughput, contribution, clamp_p)
            radiance = radiance + vwhere(add, clamped, zero3)

    # ---- BSDF sampling (stages "full" and "s2") ------------------------
    nstate, smp = _sample_bsdf(m, shading_normal, wo, incident, front,
                               state0, clamp_p, types, diffuse_occlusion,
                               position=point, sss_mode=static.sss_mode)
    if rw_ref is not None:
        # random-walk SSS override (XLA pre-stage result; integrator
        # :538-547 twin): rw lanes replace both the sample and the RNG
        # state — the walk consumed its own draws from the same fork
        used_rw = (rw_ref[RW_IDX["mask"], 0] > 0.5) \
            & (rw_ref[RW_IDX["pdf"], 0] > 0.0)
        rw_smp = Sample.invalid(t_hit)._replace(
            direction=V3(rw_ref[RW_IDX["dx"], 0], rw_ref[RW_IDX["dy"], 0],
                         rw_ref[RW_IDX["dz"], 0]),
            weight=V3(rw_ref[RW_IDX["wr"], 0], rw_ref[RW_IDX["wg"], 0],
                      rw_ref[RW_IDX["wb"], 0]),
            pdf=rw_ref[RW_IDX["pdf"], 0],
            directional_pdf=rw_ref[RW_IDX["dpdf"], 0],
            lobe_type=rw_ref[RW_IDX["lobe"], 0],
            lobe_roughness=rw_ref[RW_IDX["lrough"], 0],
            has_exit_point=rw_ref[RW_IDX["hasexit"], 0] > 0.5,
            exit_point=V3(rw_ref[RW_IDX["ex"], 0], rw_ref[RW_IDX["ey"], 0],
                          rw_ref[RW_IDX["ez"], 0]),
            exit_normal=V3(rw_ref[RW_IDX["enx"], 0],
                           rw_ref[RW_IDX["eny"], 0],
                           rw_ref[RW_IDX["enz"], 0]))
        smp = _sel_sample(used_rw, rw_smp, smp)
        nstate = jnp.where(used_rw, rw_state_ref[0], nstate)
    state = jnp.where(active & jnp.logical_not(passthrough), nstate, state0)

    # alpha pass-through: continue as a delta bounce along the same ray
    if has_tex and C.MATERIAL_PBR in types:
        one = jnp.ones_like(t_hit)
        pt_smp = Sample.invalid(one)._replace(
            direction=ray_d, weight=V3(one, one, one), pdf=one,
            directional_pdf=one,
            is_delta=jnp.ones_like(hit))
        smp = _sel_sample(passthrough, pt_smp, smp)

    active = active & (smp.pdf > 0.0)

    if chains and stage == "s2":
        # spec-NEE/MNEE delta-chain exports: the XLA host runs
        # specnee.delta_chain_estimators after this stage (the chains are
        # pure XLA incl. their traces, and consume the RNG fork-point
        # state READ-ONLY). Captured HERE = the integrator's exact chain
        # call point: post-sampling commit, post-pdf-gate, pre-RR.
        chain_ref[CHAIN_IDX["wr"], 0] = smp.weight.x
        chain_ref[CHAIN_IDX["wg"], 0] = smp.weight.y
        chain_ref[CHAIN_IDX["wb"], 0] = smp.weight.z
        chain_ref[CHAIN_IDX["dpdf"], 0] = smp.directional_pdf
        chain_ref[CHAIN_IDX["medev"], 0] = smp.medium_event
        chain_ref[CHAIN_IDX["active"], 0] = jnp.where(
            active & jnp.logical_not(passthrough), 1.0, 0.0)
        # the front-face bit the kernel actually sampled with — exported
        # rather than recomputed host-side (a raw-cross recompute could
        # flip sign vs the normalized kernel dot on near-tangent lanes)
        chain_ref[CHAIN_IDX["front"], 0] = jnp.where(front, 1.0, 0.0)
        chain_state_ref[0] = state

    # ---- medium stack push/pop -----------------------------------------
    if L.has_medium:
        med_depth = ld("med_depth")
        push = active & (smp.medium_event > 0.5)
        pop = active & (smp.medium_event < -0.5)
        sigma_in = vmaximum(m.sigma_a, 0.0)
        slot = jnp.clip(med_depth, 0.0, float(L.med_slots - 1))
        for s in range(L.med_slots):
            wr = push & (jnp.abs(slot - float(s)) < 0.5)
            cur = ldv((f"med{s}r", f"med{s}g", f"med{s}b"))
            stv((f"med{s}r", f"med{s}g", f"med{s}b"),
                vwhere(wr & alive0, sigma_in, cur))
        med_next = med_depth
        med_next = jnp.where(push, jnp.minimum(med_next + 1.0,
                                               float(L.med_slots)), med_next)
        med_next = jnp.where(pop, jnp.maximum(med_next - 1.0, 0.0), med_next)
        st("med_depth", jnp.where(alive0, med_next, med_depth))

    # ---- next ray origin (intersect.offset_ray_origin twin) ------------
    off_n = shading_normal
    bad = jnp.logical_not(vfinite(off_n)) | (vdot(off_n, off_n) <= 0.0)
    off_n = vwhere(bad, n_faced, off_n)
    sign = jnp.where(vdot(smp.direction, off_n) >= 0.0, 1.0, -1.0)
    distance = jnp.maximum(jnp.abs(t_hit) * 1e-4, C.RAY_ORIGIN_EPSILON)
    next_origin = (point + off_n * (sign * distance)
                   + smp.direction * (C.RAY_ORIGIN_EPSILON * 0.5))
    if C.MATERIAL_SUBSURFACE in types:
        # BSSRDF exit point (integrator :588-601 twin; reference
        # pathtrace.metal:6741-6766)
        en = smp.exit_normal
        bad_en = jnp.logical_not(vfinite(en)) | (vdot(en, en) <= 0.0)
        en = vwhere(bad_en, n_faced, en)
        en = vsafe_normalize(en)
        sgn_e = jnp.where(vdot(smp.direction, en) >= 0.0, 1.0, -1.0)
        exit_o = smp.exit_point + en * (sgn_e * C.RAY_ORIGIN_EPSILON)
        exit_o = exit_o + en * (C.RAY_ORIGIN_EPSILON * 32.0)
        dir_n = vsafe_normalize(smp.direction)
        exit_o = exit_o + dir_n * (C.RAY_ORIGIN_EPSILON * 32.0)
        next_origin = vwhere(smp.has_exit_point, exit_o, next_origin)

    # ---- throughput update + clamps ------------------------------------
    throughput_next = throughput * smp.weight
    throughput_next = _clamp_path_throughput(throughput_next, clamp_p)
    finite_tp = vfinite(throughput_next)
    max_tp = vmax(throughput_next)
    active = active & finite_tp & (max_tp > 0.0)

    # ---- env LOD carry (integrator body :563-577) ----------------------
    if env_mode:
        max_mip = scal("env_max_mip")
        next_active = (smp.lobe_type > 0.5) & jnp.logical_not(smp.is_delta)
        alpha_l = jnp.clip(smp.lobe_roughness, 0.0, 1.0)
        next_lod = jnp.clip(alpha_l * alpha_l * max_mip, 0.0, max_mip)
        st("env_lod", jnp.where(alive0,
                                jnp.where(active & next_active, next_lod,
                                          0.0), ld("env_lod")))
        st("env_lod_act", jnp.where(
            alive0, jnp.where(active & next_active, 1.0, 0.0),
            ld("env_lod_act")))

    # ---- ray cone ------------------------------------------------------
    hit_world = jnp.maximum(t_hit, 0.0) * jnp.sqrt(
        jnp.maximum(vdot(ray_d, ray_d), 1e-12))
    cone_w0 = ld("cone_w")
    cone_s0 = ld("cone_s")
    cone_at_hit = jnp.maximum(cone_w0 + cone_s0 * hit_world, 1e-7)
    rough_l = jnp.clip(smp.lobe_roughness, 0.0, 1.0)
    inc = jnp.where(smp.lobe_type < 0.5, 0.55,
                    jnp.where(smp.lobe_type < 1.5,
                              0.03 + (0.45 - 0.03) * rough_l,
                              0.10 + (0.60 - 0.10) * rough_l))
    inc = jnp.where(smp.is_delta, 0.0, inc)
    cone_w = jnp.where(active, cone_at_hit, cone_w0)
    cone_s = jnp.where(active, jnp.minimum(cone_s0 + inc, 1.5), cone_s0)

    # ---- bookkeeping + Russian roulette --------------------------------
    last_pdf = jnp.where(smp.directional_pdf > 0.0, smp.directional_pdf,
                         smp.pdf)
    state_rr = state
    if static.use_russian_roulette:
        do_rr = active & (depth >= 4.5) & jnp.logical_not(passthrough)
        nstate2, xi = _rand(state)
        cont_p = jnp.clip(max_tp, 0.05, 0.95)
        survive = xi <= cont_p
        throughput_next = vwhere(do_rr & survive,
                                 throughput_next * (1.0 / cont_p),
                                 throughput_next)
        active = active & (survive | jnp.logical_not(do_rr))
        state_rr = jnp.where(do_rr, nstate2, state)

    # ---- commit (dead lanes keep entry values) -------------------------
    keep = alive0

    def sel(new, old):
        return jnp.where(keep, new, old)

    ostate_ref[0] = jnp.where(keep, state_rr, state0)
    stv(("ox", "oy", "oz"), vwhere(keep, next_origin, ray_o))
    stv(("dx", "dy", "dz"), vwhere(keep, smp.direction, ray_d))
    stv(("tpr", "tpg", "tpb"), vwhere(keep, throughput_next, throughput0))
    stv(("rr", "rg", "rb"), vwhere(keep, radiance, ldv(("rr", "rg", "rb"))))
    st("alive", sel(jnp.where(alive0 & active, 1.0, 0.0), ld("alive")))
    st("last_pdf", sel(last_pdf, ld("last_pdf")))
    st("last_delta", sel(jnp.where(smp.is_delta, 1.0, 0.0),
                         ld("last_delta")))
    if L.chains:
        spec_d = jnp.where(smp.is_delta, ld("specular_depth") + 1.0, 0.0)
        st("specular_depth", sel(spec_d, ld("specular_depth")))
    st("prev_valid", sel(jnp.where(hit, 1.0, 0.0), ld("prev_valid")))
    # self-hit exclusion ids apply to TRIANGLES only (integrator commit:
    # where(prim_type == TRIANGLE, ...) — spheres/rects rely on EPSILON_T)
    hit_tri = (hit & is_tri) if has_prims else hit
    st("prev_mesh", sel(jnp.where(hit_tri, mesh_idx, -1.0),
                        ld("prev_mesh")))
    st("prev_prim", sel(jnp.where(hit_tri, tri, -1.0), ld("prev_prim")))
    if stage == "full":
        st("first_hit", sel(jnp.where(first_hit_next, 1.0, 0.0),
                            ld("first_hit")))
        stv(("aar", "aag", "aab"), vwhere(keep, aov_albedo,
                                          ldv(("aar", "aag", "aab"))))
        stv(("anx", "any", "anz"), vwhere(keep, aov_normal,
                                          ldv(("anx", "any", "anz"))))
    else:
        st("first_hit", ld("first_hit"))
        stv(("aar", "aag", "aab"), ldv(("aar", "aag", "aab")))
        stv(("anx", "any", "anz"), ldv(("anx", "any", "anz")))
    st("cone_w", sel(cone_w, cone_w0))
    st("cone_s", sel(cone_s, cone_s0))


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

def fused_supported(scene, static) -> bool:
    """Gate: the configs whose shade stage this kernel covers exactly."""
    from metal_pathtracer_tpu.ops.intersect import _use_pallas

    if os.environ.get("MPT_FUSED_SHADE", "1") != "1":
        return False
    interp = os.environ.get("MPT_FUSED_INTERPRET", "0") == "1"
    if not interp and not _use_pallas():
        return False
    has_tri = scene.triangles is not None and scene.triangles.count > 0
    if has_tri and scene.tri_packet is None and not interp:
        return False
    if not has_tri and not _scene_has_prims(scene):
        return False
    if getattr(scene, "instanced", ()) and scene.textures is not None \
            and C.MATERIAL_PBR in set(static.material_types):
        # instanced hit UVs aren't carried through the merged rows (the
        # texture stage gathers per-SOUP-TRIANGLE UVs by tri id; instanced
        # ids index their group's arrays) — XLA applies those per family.
        # Analytic spheres/rects ARE supported: they never texture
        # (prim_type gate, ops/pbr_textures.py:177) and the stage feeds
        # them their own material's identity planes by true mat id.
        return False
    if getattr(scene, "instanced", ()):
        # instanced groups need the packet kernel (or the interpreted jnp
        # path) per group, same requirement as the soup triangles
        if not interp and any(g.tri_packet is None for g in scene.instanced):
            return False
    if scene.materials.count > 128:
        # _fetch_material's select chain is sized by the ACTUAL count, so
        # only scenes that carry this many materials pay for it; beyond
        # 128 the per-stage chain (~count x 25 selects) would rival the
        # BSDF math itself and the XLA gather path wins (scene cap 512,
        # MetalShaderTypes.h:15-19)
        return False
    if static.debug_specular_only:
        return False
    types = set(static.material_types)
    if not types <= {C.MATERIAL_LAMBERTIAN, C.MATERIAL_METAL,
                     C.MATERIAL_DIELECTRIC, C.MATERIAL_DIFFUSE_LIGHT,
                     C.MATERIAL_PBR, C.MATERIAL_PLASTIC,
                     C.MATERIAL_CARPAINT, C.MATERIAL_SUBSURFACE}:
        return False
    env_mode = static.background_mode == 2
    if env_mode:
        if scene.environment is None:
            return False
    return True


def _pack_scalars(uniforms, depth, env=None):
    from metal_pathtracer_tpu.ops import bsdf as bsdf_ops

    p = bsdf_ops.make_clamp_params(uniforms)
    vals = [depth.astype(jnp.float32), p.clamp_factor, p.clamp_floor,
            p.throughput_clamp, p.specular_tail_base,
            p.specular_tail_roughness_scale, p.min_specular_pdf,
            p.max_contribution, p.enabled,
            uniforms.background_color[0], uniforms.background_color[1],
            uniforms.background_color[2],
            jnp.float32(0.0 if env is None else float(len(env.mips)))]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])


def _shade_call(stage, layout: Layout, static, m_count: int, n_blocks: int,
                mat_table, scal, carry, state, t, tri, u, v, rows,
                envbg=None, envpdf=None, rectpdf=None, emod=None,
                trans=None, esmp=None, tex=None, rw=None, rw_state=None,
                has_prims=False, rect_nee=False, chains=False):
    env_mode = static.background_mode == 2
    has_tex = tex is not None
    has_emod = emod is not None
    kern = functools.partial(_shade_kernel, stage=stage, layout=layout,
                             static=static, m_count=m_count,
                             env_mode=env_mode, has_tex=has_tex,
                             has_prims=has_prims, rect_nee=rect_nee,
                             chains=chains, has_emod=has_emod,
                             has_rw=rw is not None)
    grid = (n_blocks,)

    def plane_spec(p):
        return pl.BlockSpec((p, 1, ROWS, LANES), lambda g: (0, g, 0, 0),
                            memory_space=pltpu.VMEM)

    lane_spec = pl.BlockSpec((1, ROWS, LANES), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(mat_table.shape, lambda g: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(scal.shape, lambda g: (0,), memory_space=pltpu.SMEM),
        plane_spec(layout.P), lane_spec, lane_spec, lane_spec, lane_spec,
        lane_spec, plane_spec(ROW_PLANES),
    ]
    inputs = [mat_table, scal, carry, state, t, tri, u, v, rows]
    if env_mode and stage == "s1":
        in_specs += [plane_spec(3), lane_spec]
        inputs += [envbg, envpdf]
        if rect_nee:
            in_specs += [lane_spec]
            inputs += [rectpdf]   # rect-light pdf of the current hit
    elif rect_nee and stage == "s1":
        in_specs += [lane_spec]
        inputs += [envpdf]   # rect-light pdf of the current hit
    if has_emod and stage == "s1":
        in_specs += [plane_spec(3)]
        inputs += [emod]
    if stage == "s2":
        n_banks = 2 if (rect_nee and env_mode) else 1
        in_specs += [plane_spec(len(TRANS)),
                     plane_spec(n_banks * len(ESMP))]
        inputs += [trans, esmp]
    if rw is not None:
        in_specs += [plane_spec(len(RW)), lane_spec]
        inputs += [rw, rw_state]
    if has_tex:
        in_specs.append(plane_spec(len(TEX)))
        inputs.append(tex)

    out_specs = [plane_spec(layout.P), lane_spec]
    out_shape = [jax.ShapeDtypeStruct(carry.shape, jnp.float32),
                 jax.ShapeDtypeStruct(state.shape, jnp.uint32)]
    if stage == "s1":
        out_specs.append(plane_spec(len(TRANS)))
        out_shape.append(jax.ShapeDtypeStruct(
            (len(TRANS), n_blocks, ROWS, LANES), jnp.float32))
    if chains and stage == "s2":
        out_specs += [plane_spec(len(CHAIN)), lane_spec]
        out_shape += [
            jax.ShapeDtypeStruct((len(CHAIN), n_blocks, ROWS, LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        ]

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=os.environ.get("MPT_FUSED_INTERPRET", "0") == "1",
    )(*inputs)
    return outs


def _trace_raw(scene, o3, d3, t_min, lane_tmax, ex_mesh, ex_prim,
               any_hit=False):
    """(t, tri, u, v) raw trace: the packet kernel on TPU, the jnp
    reference traversal under interpret-mode tests."""
    from metal_pathtracer_tpu.ops.intersect import _use_pallas

    if _use_pallas():
        from metal_pathtracer_tpu.ops.pallas.traverse import packet_trace
        return packet_trace(o3, d3, t_min, lane_tmax, scene.tri_packet,
                            exclude_prim=ex_prim, any_hit=any_hit)
    from metal_pathtracer_tpu.ops import traversal
    rec = traversal.trace_triangles(o3, d3, scene, t_min, lane_tmax,
                                    exclude_mesh=ex_mesh,
                                    exclude_prim=ex_prim)
    tri = jnp.where(rec.hit, rec.prim_index, -1)
    return rec.t, tri, rec.barycentric[..., 0], rec.barycentric[..., 1]


def _scene_has_prims(scene) -> bool:
    """Any hit family beyond plain soup triangles (analytic prims or
    instanced groups) — these ride the flavored rows planes."""
    return (scene.spheres.count > 0 or scene.rects.count > 0
            or bool(getattr(scene, "instanced", ())))


def _trace_merged(scene, o3, d3, t_min, lane_tmax, ex_mesh, ex_prim):
    """Nearest-hit over spheres/rects/triangles/instanced groups with
    intersect.trace_scene's exact merge order and tie semantics (spheres,
    rects, triangles, instanced; strict `<` at each fold so the earlier
    family keeps ties).

    Returns (t, idx, u, v, rows, kind): idx >= 0 marks any hit; kind is
    the winning family (C.PRIMITIVE_* as f32, 0 = miss); rows are
    shade_packed-compatible planes where non-plain-triangle winners carry
    flags in the spare columns — raw (pre-faceforward) normal in the n0
    columns, the XLA-computed shading normal in the n1 columns (instanced
    only), material in col 18, mesh/instance id in col 19, geometric
    two_sided in col 20, flavor in col 21 (1 = plain triangle,
    0 = analytic sphere/rect, 2 = precomputed instanced triangle).
    """
    from metal_pathtracer_tpu.ops import intersect

    n = o3.shape[0]
    has_tri = scene.triangles is not None and scene.triangles.count > 0
    instanced = getattr(scene, "instanced", ())
    if has_tri:
        ex_p_tri = ex_prim
        if instanced and ex_prim is not None and ex_mesh is not None:
            # an instanced prev-hit's OBJECT tri id must not exclude a
            # soup triangle (trace_triangles' packet branch does the same)
            soup_meshes = instanced[0].base_id
            ex_p_tri = jnp.where(ex_mesh < soup_meshes, ex_prim, -1)
        t, idx, u, v = _trace_raw(scene, o3, d3, t_min, lane_tmax,
                                  ex_mesh, ex_p_tri)
        tri_i = idx.astype(jnp.int32)
        rows = scene.triangles.shade_packed[
            jnp.clip(tri_i, 0, scene.triangles.count - 1)]
        tri_hit = idx >= 0
    else:
        t = jnp.full((n,), C.INFINITY_T, jnp.float32)
        idx = jnp.full((n,), -1.0, jnp.float32)
        u = jnp.zeros((n,), jnp.float32)
        v = jnp.zeros((n,), jnp.float32)
        rows = jnp.zeros((n, 24), jnp.float32)
        tri_hit = jnp.zeros((n,), bool)
    kind = jnp.where(tri_hit, float(C.PRIMITIVE_TRIANGLE), 0.0)
    if not _scene_has_prims(scene):
        return t, idx, u, v, rows, kind
    rows = rows.at[:, 21].set(jnp.where(tri_hit, 1.0, 0.0))

    # other families (the XLA dispatchers: Pallas kernels on TPU, the
    # jnp reference on CPU — the same path integrator.trace_scene takes)
    best = {
        "hit": tri_hit, "t": jnp.where(tri_hit, t, C.INFINITY_T),
        "idx": idx, "raw_n": jnp.zeros((n, 3), jnp.float32),
        "sn": jnp.zeros((n, 3), jnp.float32),
        "mat": jnp.zeros((n,), jnp.float32),
        "mesh": jnp.zeros((n,), jnp.float32),
        "two": jnp.zeros((n,), jnp.float32),
        "flavor": jnp.zeros((n,), jnp.float32),
        "kind": kind,
    }

    def fold(rec, two_sided, fam, flavor, strict):
        # trace_scene fold order is spheres, rects, triangles, instanced
        # with strict `<` at each _closer — on exact-t ties:
        # sphere > rect > triangle > instanced. Rebuilt from the triangle
        # base: instanced folds FIRST with strict < (loses ties to the
        # base), then rects and spheres with <= (they win ties against
        # everything already folded).
        closer = (rec.t < best["t"]) if strict else (rec.t <= best["t"])
        take = rec.hit & (~best["hit"] | closer)
        raw = jnp.where(rec.front_face[..., None], rec.normal, -rec.normal)
        best["hit"] = best["hit"] | rec.hit
        best["t"] = jnp.where(take, rec.t, best["t"])
        best["idx"] = jnp.where(take, rec.prim_index.astype(jnp.float32),
                                best["idx"])
        best["raw_n"] = jnp.where(take[..., None], raw, best["raw_n"])
        best["sn"] = jnp.where(take[..., None], rec.shading_normal,
                               best["sn"])
        best["mat"] = jnp.where(take, rec.material.astype(jnp.float32),
                                best["mat"])
        best["mesh"] = jnp.where(take, rec.mesh_index.astype(jnp.float32),
                                 best["mesh"])
        best["two"] = jnp.where(take, two_sided, best["two"])
        best["kind"] = jnp.where(take, float(fam), best["kind"])
        best["flavor"] = jnp.where(take, flavor, best["flavor"])
        best["nt"] = take if "nt" not in best else (best["nt"] | take)

    if instanced:
        from metal_pathtracer_tpu.ops import traversal
        rec_i = traversal.trace_instanced(o3, d3, scene, t_min, lane_tmax,
                                          exclude_mesh=ex_mesh,
                                          exclude_prim=ex_prim)
        fold(rec_i, rec_i.two_sided.astype(jnp.float32),
             C.PRIMITIVE_TRIANGLE, 2.0, strict=True)
    if scene.rects.count > 0:
        rec_r = intersect.hit_rects(o3, d3, scene.rects, t_min, lane_tmax)
        fold(rec_r, rec_r.two_sided.astype(jnp.float32),
             C.PRIMITIVE_RECTANGLE, 0.0, strict=False)
    if scene.spheres.count > 0:
        rec_s = intersect.hit_spheres(o3, d3, scene.spheres, t_min,
                                      lane_tmax)
        fold(rec_s, jnp.ones((n,), jnp.float32), C.PRIMITIVE_SPHERE, 0.0,
             strict=False)

    nt = best["nt"]
    rows_nt = jnp.zeros((n, 24), jnp.float32)
    rows_nt = rows_nt.at[:, 9:12].set(best["raw_n"])
    rows_nt = rows_nt.at[:, 12:15].set(best["sn"])
    rows_nt = rows_nt.at[:, 18].set(best["mat"])
    rows_nt = rows_nt.at[:, 19].set(best["mesh"])
    rows_nt = rows_nt.at[:, 20].set(best["two"])
    rows_nt = rows_nt.at[:, 21].set(best["flavor"])
    rows = jnp.where(nt[:, None], rows_nt, rows)
    t = jnp.where(nt, best["t"], t)
    idx = jnp.where(nt, best["idx"], idx)
    u = jnp.where(nt, 0.0, u)
    v = jnp.where(nt, 0.0, v)
    return t, idx, u, v, rows, best["kind"]


def _occluded_merged(scene, o3, d3, t_min, shadow_max):
    """Any-hit over all primitive families (intersect.trace_occluded
    semantics) for the fused env-NEE shadow step."""
    from metal_pathtracer_tpu.ops import intersect

    if scene.triangles is not None and scene.triangles.count > 0:
        _, s_tri, _, _ = _trace_raw(scene, o3, d3, t_min, shadow_max,
                                    None, None, any_hit=True)
        occ = s_tri >= 0
    else:
        occ = jnp.zeros(o3.shape[:-1], bool)
    if scene.spheres.count > 0:
        occ = occ | intersect.hit_spheres(o3, d3, scene.spheres, t_min,
                                          shadow_max).hit
    if scene.rects.count > 0:
        occ = occ | intersect.hit_rects(o3, d3, scene.rects, t_min,
                                        shadow_max).hit
    if getattr(scene, "instanced", ()):
        from metal_pathtracer_tpu.ops import traversal
        occ = occ | traversal.trace_instanced_occluded(
            o3, d3, scene, t_min, shadow_max)
    return occ


def _apply_delta_chains(scene, uniforms, static, layout, carry_s1, carry,
                        trans, chainp, chain_state, rows, shp, unshp):
    """Run specnee.delta_chain_estimators over the S2 exports and add the
    result into the committed radiance planes (the chains are pure XLA —
    including their traces — and consume the fork-point RNG state
    read-only, exactly like the integrator's call)."""
    from types import SimpleNamespace

    from metal_pathtracer_tpu.ops import bsdf as bsdf_ops
    from metal_pathtracer_tpu.ops import specnee

    cpost = lambda nm: unshp(carry[layout[nm]])
    cpre = lambda nm: unshp(carry_s1[layout[nm]])
    chget = lambda nm: unshp(chainp[CHAIN_IDX[nm]])
    tget = lambda nm: unshp(trans[TRANS_IDX[nm]])

    smp_shim = SimpleNamespace(
        direction=jnp.stack([cpost("dx"), cpost("dy"), cpost("dz")], -1),
        is_delta=cpost("last_delta") > 0.5,
        weight=jnp.stack([chget("wr"), chget("wg"), chget("wb")], -1),
        directional_pdf=chget("dpdf"),
        medium_event=chget("medev"),
    )
    next_origin = jnp.stack([cpost("ox"), cpost("oy"), cpost("oz")], -1)
    sn3 = jnp.stack([tget("snx"), tget("sny"), tget("snz")], -1)
    throughput_pre = jnp.stack([cpre("tpr"), cpre("tpg"), cpre("tpb")], -1)
    rec_shim = SimpleNamespace(front_face=chget("front") > 0.5)
    mat_lane = jnp.clip(rows[:, 18].astype(jnp.int32), 0,
                        scene.materials.count - 1)
    is_dielectric = (scene.materials.mat_type[mat_lane]
                     == C.MATERIAL_DIELECTRIC)
    clamp_p = bsdf_ops.make_clamp_params(uniforms)
    chain_add, chain_scene, chain_shadow = specnee.delta_chain_estimators(
        scene, uniforms, static, clamp_p, throughput_pre, smp_shim,
        next_origin, rec_shim, sn3,
        cpost("specular_depth").astype(jnp.int32),
        unshp(chain_state), chget("active") > 0.5, is_dielectric)
    for i, nm in enumerate(("rr", "rg", "rb")):
        carry = carry.at[layout[nm]].add(shp(chain_add[:, i]))
    return carry, chain_scene, chain_shadow


def _shading_normal_xla(scene, rows, d3, u_p, v_p):
    """Shading-normal reconstruction over the packed hit rows — the exact
    op sequence of the s1 kernel's reconstruction (see _shade_kernel), at
    the XLA level, for pre-stages that need a normal-dependent gather
    (env-modulated light emission). rows is (n, ROW_PLANES); d3/u_p/v_p
    are padded to the stage width."""
    padded_l = d3.shape[0]
    short = padded_l - rows.shape[0]
    if short:
        rows = jnp.pad(rows, ((0, short), (0, 0)))

    def rv(i):
        return rows[:, i:i + 3]

    def safe_norm(a):
        len2 = jnp.sum(a * a, -1, keepdims=True)
        inv = jnp.where(len2 > 0.0,
                        1.0 / jnp.sqrt(jnp.maximum(len2, 1e-38)), 0.0)
        return a * inv

    tv0, tv1, tv2 = rv(0), rv(3), rv(6)
    geo_n = safe_norm(jnp.cross(tv1 - tv0, tv2 - tv0))
    front = jnp.sum(d3 * geo_n, -1) < 0.0
    n_faced = jnp.where(front[..., None], geo_n, -geo_n)
    has_prims = _scene_has_prims(scene)
    if has_prims:
        flavor = rows[:, 21]
        plain_tri = (flavor > 0.5) & (flavor < 1.5)
        precomp = flavor > 1.5
        raw_n = rv(9)
        front_nt = jnp.sum(d3 * raw_n, -1) < 0.0
        nf_nt = jnp.where(front_nt[..., None], raw_n, -raw_n)
        n_faced = jnp.where(plain_tri[..., None], n_faced, nf_nt)
    tn0, tn1, tn2 = rv(9), rv(12), rv(15)
    w0 = jnp.maximum(1.0 - u_p - v_p, 0.0)
    w1 = jnp.maximum(u_p, 0.0)
    w2 = jnp.maximum(v_p, 0.0)
    w_sum = w0 + w1 + w2
    has_w = w_sum > 1e-8
    inv_w = 1.0 / jnp.where(has_w, w_sum, 1.0)
    w0 = jnp.where(has_w, w0 * inv_w, 1.0)
    w1 = jnp.where(has_w, w1 * inv_w, 0.0)
    w2 = jnp.where(has_w, w2 * inv_w, 0.0)
    sn = tn0 * w0[..., None] + tn1 * w1[..., None] + tn2 * w2[..., None]
    sn_ok = (jnp.all(jnp.isfinite(sn), -1) & (jnp.sum(sn * sn, -1) > 0.0))
    sn = jnp.where((jnp.sum(sn * n_faced, -1) < 0.0)[..., None], -sn, sn)
    sn = safe_norm(sn)
    shading_normal = jnp.where(sn_ok[..., None], sn, n_faced)
    if has_prims:
        shading_normal = jnp.where(
            plain_tri[..., None], shading_normal,
            jnp.where(precomp[..., None], tn1, n_faced))
    return shading_normal


def _octmorton_key(carry_flat, layout, alive_flat):
    """Per-lane u32 compaction sort key: dead(1) | dir-octant(3) |
    origin Morton(24). Dead lanes to the tail; alive lanes grouped by
    ray heading, Morton-ordered by origin inside each octant — the
    ordering the r03 reorder-ceiling experiment measured best on
    divergent bounce wavefronts."""
    ox = carry_flat[layout["ox"]]
    oy = carry_flat[layout["oy"]]
    oz = carry_flat[layout["oz"]]
    dx = carry_flat[layout["dx"]]
    dy = carry_flat[layout["dy"]]
    dz = carry_flat[layout["dz"]]
    octant = ((dx < 0).astype(jnp.uint32)
              | ((dy < 0).astype(jnp.uint32) << 1)
              | ((dz < 0).astype(jnp.uint32) << 2))

    def q8(v):
        lo = jnp.min(jnp.where(alive_flat, v, jnp.inf))
        hi = jnp.max(jnp.where(alive_flat, v, -jnp.inf))
        t = (v - lo) / jnp.maximum(hi - lo, 1e-20)
        return jnp.clip(t * 255.0, 0.0, 255.0).astype(jnp.uint32)

    def part1by2(x):
        # spread 8 bits to every 3rd position (Morton interleave)
        x = (x | (x << 16)) & jnp.uint32(0xFF0000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = (part1by2(q8(ox)) | (part1by2(q8(oy)) << 1)
              | (part1by2(q8(oz)) << 2))          # 24 bits
    dead = jnp.logical_not(alive_flat).astype(jnp.uint32)
    return (dead << 31) | (octant << 28) | morton


def trace_paths_fused(scene, uniforms, static, state, ray_o, ray_d):
    """Drop-in for integrator.trace_paths on fused-supported configs.

    Returns (state, radiance, aov_albedo, aov_normal, stats).
    """
    n = ray_o.shape[0]
    n_blocks = max((n + BLOCK - 1) // BLOCK, 1)
    padded = n_blocks * BLOCK

    types = set(static.material_types)
    env_mode = static.background_mode == 2
    rect_nee = (scene.light_rect_indices is not None
                and scene.light_rect_indices.shape[0] > 0)
    # env-modulated DIFFUSE_LIGHT emission (emission_env materials under
    # an env background) — XLA pre-stage feeds the modulation plane
    has_emod = (env_mode and scene.environment is not None
                and C.MATERIAL_DIFFUSE_LIGHT in types)
    # spec-NEE/MNEE delta chains: run XLA-side off the S2 exports when the
    # integrator would run them (lights + flags) AND a material type that
    # can set smp.is_delta exists — without one, chain_add is identically
    # zero (bsdf.material_is_delta needs dielectric/metal/PBR and alpha
    # passthrough needs PBR), so lambert/light scenes skip the chain
    # traces the XLA body would still pay for
    chains_on = ((static.enable_specular_nee or static.enable_mnee)
                 and (env_mode or rect_nee)
                 and bool(types & {C.MATERIAL_DIELECTRIC, C.MATERIAL_METAL,
                                   C.MATERIAL_PBR}))
    # Measurement-only stage bisection (tools/abbench.py frame variants):
    # MPT_STAGE_SKIP="chains,shadow,envsample,texture" stubs individual
    # glue stages so their cost can be timed by difference. Radiometry is
    # wrong with any skip on — read at TRACE time like MPT_TRAVERSE_DEBUG.
    _skips = frozenset(filter(None, os.environ.get(
        "MPT_STAGE_SKIP", "").split(",")))
    chains_on = chains_on and "chains" not in _skips
    has_medium = bool(types & {C.MATERIAL_DIELECTRIC, C.MATERIAL_PBR,
                               C.MATERIAL_SUBSURFACE})
    # random-walk SSS (sss_mode==2): the walk traces the scene per step,
    # so it runs as an XLA pre-stage whose result planes override the
    # kernel's sampled lobe on walk lanes (integrator :538-547)
    rw_on = (C.MATERIAL_SUBSURFACE in types and static.sss_mode == 2)
    has_tex = (scene.textures is not None and C.MATERIAL_PBR in types)
    layout = Layout(has_medium, env_mode, chains_on)
    m_count = int(scene.materials.count)
    mat_table = pack_material_table(scene.materials)
    env = scene.environment

    def _stage_fns(padded_l):
        """Size-parameterized depth-loop machinery: the survivor-
        compaction phase re-runs the SAME body over a smaller dense
        wavefront, so every helper closes over the stage width."""
        n_blocks_l = padded_l // BLOCK

        def pad1(a, fill=0.0):
            # inputs are (n,) (host wavefront) or already (padded,) (trace
            # outputs / derived planes) — pad only what needs it
            short = padded_l - a.shape[0]
            if short == 0:
                return a
            return jnp.pad(a, (0, short), constant_values=fill)

        def shp(a):
            return a.reshape(n_blocks_l, ROWS, LANES)

        def unshp(a):
            return a.reshape(padded_l)

        def planes3(x, y, z):
            return jnp.stack([shp(pad1(x)), shp(pad1(y)), shp(pad1(z))])

        def shp_rows(rows):
            short = padded_l - rows.shape[0]
            if short:
                rows = jnp.pad(rows, ((0, short), (0, 0)))
            return rows.T[:ROW_PLANES].reshape(ROW_PLANES, n_blocks_l,
                                                ROWS, LANES)

        def cond(loop):
            depth, carry, state_p, n_rays, n_shadow = loop
            return jnp.logical_and(
                depth < static.max_depth,
                jnp.any(carry[layout["alive"]] > 0.5))

        def body(loop):
            depth, carry, state_p, n_rays, n_shadow = loop
            alive = unshp(carry[layout["alive"]]) > 0.5
            n_rays = n_rays + jnp.sum(alive.astype(jnp.float32))

            cget = lambda nm: unshp(carry[layout[nm]])
            o3 = jnp.stack([cget(c) for c in ("ox", "oy", "oz")], -1)
            d3 = jnp.stack([cget(c) for c in ("dx", "dy", "dz")], -1)
            prev_valid = cget("prev_valid") > 0.5
            ex_prim = jnp.where(prev_valid, cget("prev_prim"),
                                -1.0).astype(jnp.int32)
            ex_mesh = jnp.where(prev_valid, cget("prev_mesh"),
                                -1.0).astype(jnp.int32)
            lane_tmax = jnp.where(alive, C.INFINITY_T, 0.0)
            t, tri, u, v, rows, kind = _trace_merged(scene, o3, d3, C.EPSILON_T,
                                                     lane_tmax, ex_mesh, ex_prim)
            tri_i = tri.astype(jnp.int32)
            rows_t = shp_rows(rows)
            scal = _pack_scalars(uniforms, depth, env)
            args = dict(
                mat_table=mat_table, scal=scal,
                t=shp(pad1(t)), tri=shp(pad1(tri.astype(jnp.float32),
                                             fill=-1.0)),
                u=shp(pad1(u)), v=shp(pad1(v)), rows=rows_t,
                has_prims=_scene_has_prims(scene))

            tex_planes = None
            if has_tex:
                # Per-chunk skip: material index rides shade_packed col 18
                # (already gathered), so "any active PBR lane?" costs one
                # small matmul; chunks without PBR hits export identity
                # planes (what apply_pbr_textures returns for non-PBR lanes)
                # without the ~25 gathers/lane texture stage.
                mat_lane = jnp.clip(rows[:, 18].astype(jnp.int32), 0,
                                    scene.materials.count - 1)
                is_pbr_m = (scene.materials.mat_type == C.MATERIAL_PBR
                            ).astype(jnp.float32)
                onehot = (mat_lane[:, None] ==
                          jnp.arange(scene.materials.count)[None, :]
                          ).astype(jnp.float32)
                lane_pbr = jax.lax.dot_general(
                    onehot, is_pbr_m, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST) > 0.5
                if _scene_has_prims(scene):
                    # only plain soup triangles carry textures (flavor 1);
                    # analytic/instanced winners take the identity planes
                    plain_tri_l = (rows[:, 21] > 0.5) & (rows[:, 21] < 1.5)
                else:
                    plain_tri_l = None
                tex_eligible = alive & (tri_i >= 0) & lane_pbr
                if plain_tri_l is not None:
                    tex_eligible = tex_eligible & plain_tri_l
                if "texture" in _skips:
                    tex_eligible = jnp.zeros_like(tex_eligible)
                pbr_any = jnp.any(tex_eligible)

                state_flat = unshp(state_p)
                cw_f = unshp(carry[layout["cone_w"]])
                cs_f = unshp(carry[layout["cone_s"]])
                tex_planes, tex_state = _texture_dispatch(
                    scene, uniforms, static, cw_f, cs_f, o3, d3, t, tri_i,
                    u, v, depth, shp, state_flat, mat_lane, plain_tri_l,
                    tex_eligible, pbr_any, padded_l)
                # alpha-BLEND lanes consumed one draw (integrator commits
                # where(active, texd.state, state) before the NEE draws)
                state_p = shp(jnp.where(alive & (tri_i >= 0), tex_state,
                                        state_flat))
            def rw_prestage(state_flat):
                """Random-walk SSS pre-stage: run sss_ops.sample_sss_-
                random_walk on walk lanes from the same RNG fork the
                kernel samples from; chunks with no walk lane this depth
                skip the sss_max_steps scene traces wholesale."""
                from types import SimpleNamespace

                from metal_pathtracer_tpu.ops import bsdf as bsdf_ops
                from metal_pathtracer_tpu.ops import sss as sss_ops
                from metal_pathtracer_tpu.ops.vecmath import (
                    normalize as x_normalize,
                )

                mat_lane = jnp.clip(rows[:, 18].astype(jnp.int32), 0,
                                    scene.materials.count - 1)
                is_rw_m = ((scene.materials.mat_type
                            == C.MATERIAL_SUBSURFACE)
                           & (scene.materials.sss_method >= 0.5))
                # XLA twin of the kernel's geometric front recompute
                # (the _shading_normal_xla prefix ops)
                rows_p = rows
                short = padded_l - rows_p.shape[0]
                if short:
                    rows_p = jnp.pad(rows_p, ((0, short), (0, 0)))
                tv0 = rows_p[:, 0:3]
                tv1 = rows_p[:, 3:6]
                tv2 = rows_p[:, 6:9]

                def safe_norm(a):
                    len2 = jnp.sum(a * a, -1, keepdims=True)
                    inv = jnp.where(
                        len2 > 0.0,
                        1.0 / jnp.sqrt(jnp.maximum(len2, 1e-38)), 0.0)
                    return a * inv

                geo_n = safe_norm(jnp.cross(tv1 - tv0, tv2 - tv0))
                front = jnp.sum(d3 * geo_n, -1) < 0.0
                n_faced = jnp.where(front[..., None], geo_n, -geo_n)
                if _scene_has_prims(scene):
                    flavor = rows_p[:, 21]
                    plain_tri = (flavor > 0.5) & (flavor < 1.5)
                    raw_n = rows_p[:, 9:12]
                    front_nt = jnp.sum(d3 * raw_n, -1) < 0.0
                    nf_nt = jnp.where(front_nt[..., None], raw_n, -raw_n)
                    n_faced = jnp.where(plain_tri[..., None], n_faced,
                                        nf_nt)
                    front = jnp.where(plain_tri, front, front_nt)
                rw_lanes = (alive & (tri_i >= 0) & is_rw_m[mat_lane]
                            & front)

                def _rw_run(sf):
                    m_x = bsdf_ops.gather_material(scene.materials,
                                                   mat_lane)
                    incident_x = x_normalize(d3)
                    rec_shim = SimpleNamespace(
                        normal=n_faced, front_face=rw_lanes,
                        point=o3 + pad1(t)[..., None] * d3)
                    clamp_x = bsdf_ops.make_clamp_params(uniforms)
                    rw_st, rw_smp = sss_ops.sample_sss_random_walk(
                        scene, m_x, rec_shim, -incident_x, incident_x,
                        sf, clamp_x, static.sss_max_steps)
                    planes = [
                        rw_lanes.astype(jnp.float32),
                        rw_smp.direction[:, 0], rw_smp.direction[:, 1],
                        rw_smp.direction[:, 2],
                        rw_smp.weight[:, 0], rw_smp.weight[:, 1],
                        rw_smp.weight[:, 2],
                        rw_smp.pdf, rw_smp.directional_pdf,
                        rw_smp.lobe_type.astype(jnp.float32),
                        rw_smp.lobe_roughness,
                        rw_smp.has_exit_point.astype(jnp.float32),
                        rw_smp.exit_point[:, 0], rw_smp.exit_point[:, 1],
                        rw_smp.exit_point[:, 2],
                        rw_smp.exit_normal[:, 0],
                        rw_smp.exit_normal[:, 1],
                        rw_smp.exit_normal[:, 2],
                    ]
                    return (jnp.stack([shp(p.astype(jnp.float32))
                                       for p in planes]),
                            shp(jnp.where(rw_lanes, rw_st, sf)))

                def _rw_skip(sf):
                    return (jnp.zeros((len(RW), n_blocks_l, ROWS, LANES),
                                      jnp.float32), shp(sf))

                return jax.lax.cond(jnp.any(rw_lanes), _rw_run, _rw_skip,
                                    state_flat)

            if not env_mode and not rect_nee:
                rw_planes = rw_state_planes = None
                if rw_on:
                    # the full kernel samples from its input state (no NEE
                    # draws), so this is the integrator's exact fork point
                    rw_planes, rw_state_planes = rw_prestage(
                        unshp(state_p))
                carry, state_p = _shade_call(
                    "full", layout, static, m_count, n_blocks_l,
                    carry=carry, state=state_p, tex=tex_planes,
                    rw=rw_planes, rw_state=rw_state_planes, **args)
                return depth + 1, carry, state_p, n_rays, n_shadow

            # ---- NEE path(s): S1 (emissive MIS + RNG draw export), XLA
            # light sampling + shadow trace per light integral (rect
            # and/or env), S2 (NEE commits + BSDF sample). Mirrors the
            # integrator's rect block then env block.
            from metal_pathtracer_tpu.ops import env as env_ops
            from metal_pathtracer_tpu.ops.integrator import (
                _rect_light_pdf_for_hit,
                _rect_light_sample_from_uniforms,
            )

            s1_extra = {}
            if env_mode:
                # Per-chunk skip (~13 gathers/lane): the s1 kernel reads
                # these planes only under where(miss, ...), and zeros
                # produce a zero contribution with no non-finite
                # intermediates — so chunks with no miss lane this depth
                # skip the env lookups wholesale.
                def _bg_run(_):
                    bg = env_ops.environment_background(
                        env, d3, uniforms, static, cget("env_lod"),
                        cget("env_lod_act") > 0.5)
                    pdf = env_ops.environment_pdf(
                        env, d3, uniforms.environment_rotation)
                    return bg, pdf

                def _bg_skip(_):
                    return (jnp.zeros(d3.shape, jnp.float32),
                            jnp.zeros(d3.shape[:-1], jnp.float32))

                bg, env_pdf_d = jax.lax.cond(
                    jnp.logical_and(jnp.any(alive & (tri_i < 0)),
                                    "envsample" not in _skips),
                    _bg_run, _bg_skip, 0)
                s1_extra["envbg"] = planes3(bg[:, 0], bg[:, 1], bg[:, 2])
                s1_extra["envpdf"] = shp(pad1(env_pdf_d))
            if rect_nee:
                from types import SimpleNamespace

                point_xla = o3 + t[..., None] * d3
                rec_shim = SimpleNamespace(
                    prim_index=tri_i, point=point_xla,
                    prim_type=kind.astype(jnp.int32))
                lpdf = _rect_light_pdf_for_hit(scene, rec_shim, o3)
                s1_extra["rectpdf" if env_mode else "envpdf"] = \
                    shp(pad1(lpdf))
            if has_emod:
                # env-modulated DIFFUSE_LIGHT emission: the kernel needs
                # environment_color(-shading_normal) for light-hit lanes
                # (integrator body ~:435-442). Shading normal recomputed
                # here with the kernel's exact reconstruction ops; gathers
                # skipped per chunk when no modulated light was hit.
                def _emod_run(_):
                    sn = _shading_normal_xla(scene, rows, d3, pad1(u),
                                             pad1(v))
                    return env_ops.environment_color(
                        env, -sn, uniforms.environment_rotation,
                        uniforms.environment_intensity, static)

                def _emod_skip(_):
                    return jnp.ones(d3.shape, jnp.float32)

                mat_lane_e = jnp.clip(rows[:, 18].astype(jnp.int32), 0,
                                      scene.materials.count - 1)
                emod_m = ((scene.materials.mat_type == C.MATERIAL_DIFFUSE_LIGHT)
                          & (scene.materials.emission_env > 0.0))
                hit_emod = jnp.any(alive & (tri_i >= 0)
                                   & emod_m[mat_lane_e])
                emod = jax.lax.cond(hit_emod, _emod_run, _emod_skip, 0)
                s1_extra["emod"] = planes3(emod[:, 0], emod[:, 1],
                                           emod[:, 2])

            carry, state_p, trans = _shade_call(
                "s1", layout, static, m_count, n_blocks_l,
                carry=carry, state=state_p, tex=tex_planes,
                rect_nee=rect_nee, **s1_extra, **args)

            rw_planes = rw_state_planes = None
            if rw_on:
                # the S2 kernel samples from the POST-S1 state (NEE draws
                # already consumed) — the integrator's exact fork point
                rw_planes, rw_state_planes = rw_prestage(unshp(state_p))

            tget = lambda nm: unshp(trans[TRANS_IDX[nm]])
            sn3 = jnp.stack([tget("snx"), tget("sny"), tget("snz")], -1)
            nf3 = jnp.stack([tget("nfx"), tget("nfy"), tget("nfz")], -1)
            p3 = jnp.stack([tget("px"), tget("py"), tget("pz")], -1)
            nee_lanes = ((tget("active") > 0.5) & (tget("delta") < 0.5))
            if has_tex:
                nee_lanes = nee_lanes & (
                    unshp(tex_planes[TEX_IDX["tpass"]]) < 0.5)
            # offset_ray_origin twin over the exported hit planes
            sn_len2 = jnp.sum(sn3 * sn3, -1)
            off_bad = ~jnp.all(jnp.isfinite(sn3), -1) | (sn_len2 <= 0.0)
            off_n = jnp.where(off_bad[..., None], nf3, sn3)
            dist = jnp.maximum(jnp.abs(pad1(t)) * 1e-4,
                               C.RAY_ORIGIN_EPSILON)

            def shadow_bank(l_dir, l_rad, l_pdf, l_valid, l_max):
                """One NEE shadow trace -> 9 esmp planes (integrator's
                offset + occlusion block, shared by rect and env)."""
                n_dot_l = jnp.maximum(jnp.sum(sn3 * l_dir, -1), 0.0)
                do_sh = nee_lanes & l_valid & (l_pdf > 0.0) & (n_dot_l > 0.0)
                sgn = jnp.where(jnp.sum(l_dir * off_n, -1) >= 0.0, 1.0, -1.0)
                sh_o = (p3 + off_n * (sgn * dist)[..., None]
                        + l_dir * (C.RAY_ORIGIN_EPSILON * 0.5))
                sh_max = jnp.where(do_sh, l_max, 0.0)
                if "shadow" in _skips:
                    occ = jnp.zeros(do_sh.shape, bool)
                else:
                    occ = _occluded_merged(scene, sh_o, l_dir, C.EPSILON_T,
                                           sh_max)
                planes = [
                    shp(l_dir[:, 0]), shp(l_dir[:, 1]), shp(l_dir[:, 2]),
                    shp(l_rad[:, 0]), shp(l_rad[:, 1]), shp(l_rad[:, 2]),
                    shp(l_pdf), shp(l_valid.astype(jnp.float32)),
                    shp(occ.astype(jnp.float32))]
                return planes, jnp.sum(do_sh.astype(jnp.float32))

            banks = []
            if rect_nee:
                l_dir, l_dist, l_pdf, l_emission, l_valid = \
                    _rect_light_sample_from_uniforms(
                        scene, p3, tget("u1"), tget("u2"), tget("u3"),
                        static, uniforms)
                bank, ns = shadow_bank(
                    l_dir, l_emission, l_pdf, l_valid,
                    jnp.maximum(l_dist - C.EPSILON_T, C.EPSILON_T))
                banks += bank
                n_shadow = n_shadow + ns
            if env_mode:
                eu = ("u4", "u5", "u6") if rect_nee else ("u1", "u2", "u3")
                if "envsample" in _skips:
                    e_dir = jnp.zeros((padded_l, 3), jnp.float32
                                      ).at[:, 1].set(1.0)
                    e_rad = jnp.zeros((padded_l, 3), jnp.float32)
                    e_pdf = jnp.zeros(padded_l, jnp.float32)
                    e_valid = jnp.zeros(padded_l, bool)
                else:
                    e_dir, e_rad, e_pdf, e_valid = \
                        env_ops.sample_environment_from_uniforms(
                            env, tget(eu[0]), tget(eu[1]), tget(eu[2]),
                            uniforms, static, tget("lrough"))
                bank, ns = shadow_bank(e_dir, e_rad, e_pdf, e_valid,
                                       C.INFINITY_T)
                banks += bank
                n_shadow = n_shadow + ns

            esmp = jnp.stack(banks)
            carry_s1 = carry
            outs = _shade_call(
                "s2", layout, static, m_count, n_blocks_l,
                carry=carry, state=state_p, trans=trans, esmp=esmp,
                tex=tex_planes, rect_nee=rect_nee, chains=chains_on,
                rw=rw_planes, rw_state=rw_state_planes, **args)
            if chains_on:
                carry, state_p, chainp, chain_state = outs
                # per-depth skip: every chain estimator requires an
                # active DELTA sample this bounce (specnee spec/mnee
                # eligibility both include smp.is_delta); depths whose
                # wavefront carries none — most depths on diffuse-heavy
                # content once the glass lanes die — skip the chain
                # traces + estimator math wholesale. Contributions are
                # identically zero on skipped depths.
                chain_lanes = ((unshp(chainp[CHAIN_IDX["active"]]) > 0.5)
                               & (unshp(carry[layout["last_delta"]]) > 0.5))

                def _chains_run(args):
                    carry_in, chainp_in, chain_state_in = args
                    return _apply_delta_chains(
                        scene, uniforms, static, layout, carry_s1,
                        carry_in, trans, chainp_in, chain_state_in, rows,
                        shp, unshp)

                def _chains_skip(args):
                    return args[0], jnp.float32(0.0), jnp.float32(0.0)

                gate = jnp.any(chain_lanes)
                if os.environ.get("MPT_CHAIN_SKIP", "1") != "1":
                    gate = jnp.ones((), bool)   # A/B: always run
                carry, chain_scene, chain_shadow = jax.lax.cond(
                    gate, _chains_run, _chains_skip,
                    (carry, chainp, chain_state))
                n_rays = n_rays + chain_scene
                n_shadow = n_shadow + chain_shadow
            else:
                carry, state_p = outs
            return depth + 1, carry, state_p, n_rays, n_shadow

        return cond, body, pad1, shp, unshp

    cond, body, pad1, shp, unshp = _stage_fns(padded)

    # initial carry planes (integrator.trace_paths init twin)
    zero = jnp.zeros(padded, jnp.float32)
    one = jnp.ones(padded, jnp.float32)
    from metal_pathtracer_tpu.ops.integrator import _primary_cone_spread
    planes = {name: zero for name in layout.names}
    planes.update(
        ox=pad1(ray_o[:, 0]), oy=pad1(ray_o[:, 1]), oz=pad1(ray_o[:, 2]),
        dx=pad1(ray_d[:, 0], 1.0), dy=pad1(ray_d[:, 1]),
        dz=pad1(ray_d[:, 2]),
        tpr=one, tpg=one, tpb=one,
        alive=pad1(jnp.ones(n, jnp.float32)),
        last_pdf=one, last_delta=one,
        prev_mesh=-one, prev_prim=-one,
        first_hit=one,
        cone_w=jnp.broadcast_to(
            jnp.maximum(2.0 * uniforms.camera.lens_radius, 0.0),
            (padded,)).astype(jnp.float32),
        cone_s=jnp.broadcast_to(
            _primary_cone_spread(uniforms, static),
            (padded,)).astype(jnp.float32),
    )
    carry = jnp.stack([shp(planes[nm]) for nm in layout.names])
    state_p = shp(pad1(state.astype(jnp.uint32)))
    n_rays0 = jnp.float32(0.0)
    n_shadow0 = jnp.float32(0.0)

    depth0 = jnp.int32(0)

    # ---- survivor compaction between depth generations -----------------
    # Measured (r03, headline scene): depths 5-8 cost ~0.83 s/depth while
    # tracing <3% of the rays — the scattered survivors keep every packet
    # partially alive (packet-level dead compaction never fires) and every
    # full-width stage runs for a handful of lanes. The classic wavefront
    # fix (SURVEY §7: "stream compaction between stages"): after
    # MPT_COMPACT_DEPTH depths, stable-argsort lanes by alive, gather the
    # survivors into dense MPT_COMPACT_SEG-lane segments, run the SAME
    # depth body over each segment, and scatter the planes back. Per-lane
    # results are bit-identical (all lane state rides the permutation; the
    # per-chunk stage gates are value-identical either way) — only the
    # stage widths and packet occupancy change.
    # Defaults from the on-chip sweep (r03, headline scene, s/sample):
    # off 8.53; d3/32k 4.93; d2/32k 4.68; d2/16k 4.54; d2/8k 4.18 (best);
    # d2/4k 4.24; d1/32k 8.25 (too early — 40% survive depth 1).
    # MPT_COMPACT_SCHEDULE="d:seg,d:seg" compacts more than once as the
    # wavefront shrinks; the single-point MPT_COMPACT_DEPTH/SEG pair is
    # the common case.
    # Default two-point schedule (on-chip interleaved A/B, headline):
    # an early depth-1 reorder at 32K segments + the depth-2 8K
    # compaction measured 4191 -> 4012 ms/sample vs depth-2 alone — at
    # depth 1 the wavefront is still ~50-70% alive, so the win is the
    # octant+Morton reorder densifying divergent packets, not width.
    # (The r03 single-point d1/seg32k=8.25s measurement predated both
    # multi-point schedules and the octmorton key.)
    sched_env = os.environ.get("MPT_COMPACT_SCHEDULE", "")
    if not sched_env and (os.environ.get("MPT_COMPACT_DEPTH")
                          or os.environ.get("MPT_COMPACT_SEG")):
        # legacy single-point overrides still respected
        sched_env = (f"{os.environ.get('MPT_COMPACT_DEPTH', '2')}:"
                     f"{os.environ.get('MPT_COMPACT_SEG', '8192')}")
    if not sched_env:
        # r04 retune (interleaved medians, headline): after the env
        # gather packing the tighter schedule wins — 1:32k,2:8k 4245 ->
        # 1:16k,2:4k 3845 -> +4:1024 late point 4584-vs-5042-scale +10%
        # again (absolute ms drift run-to-run; both steps won WITHIN
        # their runs)
        sched_env = "1:16384,2:4096,4:1024"
    schedule = [(int(p.split(":")[0]),
                 max(int(p.split(":")[1]), BLOCK))
                for p in sched_env.split(",") if p]
    schedule = sorted(
        (d, s) for d, s in schedule
        if 0 < d < static.max_depth and padded > s
        and padded % s == 0 and s % BLOCK == 0)

    if not schedule:
        _, carry, state_p, n_rays, n_shadow = jax.lax.while_loop(
            cond, body, (depth0, carry, state_p, n_rays0, n_shadow0))
    else:
        def cond_until(bound, c):
            def cb(loop):
                return jnp.logical_and(loop[0] < bound, c(loop))
            return cb

        bounds = [d for d, _ in schedule] + [int(static.max_depth)]
        _, carry, state_p, n_rays, n_shadow = jax.lax.while_loop(
            cond_until(bounds[0], cond), body,
            (depth0, carry, state_p, n_rays0, n_shadow0))

        n_planes = carry.shape[0]
        carry_flat = carry.reshape(n_planes, padded)
        state_flat = state_p.reshape(padded)
        identity = os.environ.get("MPT_COMPACT_IDENTITY", "0") == "1"
        # octmorton default: A/B'd on-chip (interleaved medians) — headline
        # 4407 -> 4196 ms/sample, lambert 736 -> 648 (64K chunks), winning
        # every round on both; bit-identical per lane (the reorder is just
        # a different permutation riding the same compaction gather).
        key_mode = os.environ.get("MPT_COMPACT_KEY", "octmorton")

        for k, (dk, seg) in enumerate(schedule):
            alive_flat = carry_flat[layout["alive"]] > 0.5
            if identity:
                # debug: segment WITHOUT reordering — isolates stage-width
                # (shape) effects from lane-permutation effects
                order = jnp.arange(padded, dtype=jnp.int32)
                n_seg = jnp.int32(padded // seg)
            else:
                if key_mode == "octmorton":
                    # alive-first, then (direction octant, origin Morton):
                    # the reorder rides the compaction gather for free —
                    # the best measured global resort bought 1.37x on the
                    # divergent bounce trace (BENCHMARKS "Ray binning")
                    key = _octmorton_key(carry_flat, layout, alive_flat)
                else:
                    # stable alive-first keeps tile order within the alive
                    # block, so compacted packets inherit image coherence
                    key = jnp.logical_not(alive_flat).astype(jnp.uint8)
                order = jnp.argsort(key, stable=True)
                n_seg = (jnp.sum(alive_flat.astype(jnp.int32))
                         + jnp.int32(seg - 1)) // jnp.int32(seg)
            condk, bodyk = _stage_fns(seg)[:2]
            condk = cond_until(bounds[k + 1], condk)
            d_start = jnp.int32(dk)

            def seg_body(sc, order=order, seg=seg, condk=condk,
                         bodyk=bodyk, d_start=d_start):
                s, carry_flat, state_flat, n_rays, n_shadow = sc
                idx = jax.lax.dynamic_slice(order, (s * seg,), (seg,))
                cs = carry_flat[:, idx].reshape(n_planes, seg // BLOCK,
                                                ROWS, LANES)
                ss = state_flat[idx].reshape(seg // BLOCK, ROWS, LANES)
                _, cs, ss, n_rays, n_shadow = jax.lax.while_loop(
                    condk, bodyk, (d_start, cs, ss, n_rays, n_shadow))
                carry_flat = carry_flat.at[:, idx].set(
                    cs.reshape(n_planes, seg))
                state_flat = state_flat.at[idx].set(ss.reshape(seg))
                return s + 1, carry_flat, state_flat, n_rays, n_shadow

            _, carry_flat, state_flat, n_rays, n_shadow = jax.lax.while_loop(
                lambda sc: sc[0] < n_seg, seg_body,
                (jnp.int32(0), carry_flat, state_flat, n_rays, n_shadow))
        carry = carry_flat.reshape(n_planes, n_blocks, ROWS, LANES)
        state_p = state_flat.reshape(n_blocks, ROWS, LANES)

    def unp(nm):
        return unshp(carry[layout[nm]])[:n]

    radiance = jnp.stack([unp("rr"), unp("rg"), unp("rb")], -1)
    aov_albedo = jnp.stack([unp("aar"), unp("aag"), unp("aab")], -1)
    aov_normal = jnp.stack([unp("anx"), unp("any"), unp("anz")], -1)
    out_state = state_p.reshape(padded)[:n]
    stats = {"rays": n_rays, "shadow_rays": n_shadow}
    return out_state, radiance, aov_albedo, aov_normal, stats


def _texture_identity(scene, static, mat_lane, shp, state):
    """TEX planes for a chunk with no textured-PBR hit lane: all-zero
    planes (a broadcast). The kernels select texture overrides per lane
    on the tpbr flag plane (plane 14, zero here), so non-textured lanes
    keep the kernel's own SMEM material fetch — this branch used to
    gather_material at full width every chunk x depth. On-chip A/B:
    neutral-to-+0.7% (XLA's small-table gather was cheap), kept for the
    simpler program (BENCHMARKS round-5)."""
    del scene, static
    zero = shp(jnp.zeros(mat_lane.shape, jnp.float32))
    return jnp.stack([zero] * 15), state


def _texture_dispatch(scene, uniforms, static, cw, cs, o3, d3, t, tri_i,
                      u, v, depth, shp, state, mat_lane, plain,
                      tex_eligible, pbr_any, padded_l):
    """Route the texture pre-stage by runtime demand: no eligible lane ->
    identity planes; a few eligible lanes -> sparse-compacted stage;
    many -> the full-width stage.

    Sparse-compacted stage (round 5): the stage's ~25 gathers/lane used
    to run at FULL wavefront width for every chunk with >=1 PBR hit,
    while the eligible lanes are typically a few % (one textured object
    in frame). cumsum-compact the eligible lanes into a CAPL-lane dense
    buffer, run the IDENTICAL per-lane stage there, scatter the planes
    back over the identity planes. Per-lane equal to the full-width
    stage (rng state bit-identical — the stage is lane-pure, gathers by
    that lane's tri/uv only, and the alpha-BLEND rng advance is
    per-lane masked, pbr_textures.py:284-286; sampled values up to XLA
    shape-dependent rounding, tests/test_texture_sparse.py). Overflow
    (> CAPL eligible) falls back to the full-width stage via
    lax.switch. MPT_TEX_SPARSE=D sets the cap to padded_l/D (0
    disables; default 8)."""

    def _tex_full(s):
        return _texture_stage(scene, uniforms, static, cw, cs,
                              o3, d3, t, tri_i, u, v, depth, shp, s,
                              mat_lane=mat_lane, plain=plain)

    def _tex_ident(s):
        return _texture_identity(scene, static, mat_lane, shp, s)

    capdiv = int(os.environ.get("MPT_TEX_SPARSE", "8"))
    CAPL = 0
    if capdiv > 0:
        CAPL = max(BLOCK, -(-padded_l // capdiv // BLOCK) * BLOCK)
    if not CAPL or CAPL >= padded_l:
        return jax.lax.cond(pbr_any, _tex_full, _tex_ident, state)

    nb_s = CAPL // BLOCK

    def shp_s(a):
        return a.reshape(nb_s, ROWS, LANES)

    def _tex_sparse(s):
        flags = tex_eligible
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        slot = jnp.where(flags, pos, CAPL)
        idx = jnp.full((CAPL + 1,), padded_l, jnp.int32).at[slot].set(
            jnp.arange(padded_l, dtype=jnp.int32), mode="drop")[:CAPL]
        valid = idx < padded_l
        idxc = jnp.minimum(idx, padded_l - 1)

        def g(a, fill=0.0):
            return jnp.where(valid, a[idxc], jnp.asarray(fill, a.dtype))

        o3_s = jnp.where(valid[:, None], o3[idxc], 0.0)
        d3_s = jnp.where(valid[:, None], d3[idxc], 1.0)
        tri_s = jnp.where(valid, tri_i[idxc], -1)
        planes_s, state_s = _texture_stage(
            scene, uniforms, static, g(cw), g(cs),
            o3_s, d3_s, g(t), tri_s, g(u), g(v),
            depth, shp_s, g(s), mat_lane=g(mat_lane), plain=None)
        ident, _ = _tex_ident(s)
        full = []
        for p in range(15):
            fp = ident[p].reshape(padded_l).at[idx].set(
                planes_s[p].reshape(CAPL), mode="drop")
            full.append(shp(fp))
        st = s.at[idx].set(state_s, mode="drop")
        return jnp.stack(full), st

    n_elig = jnp.sum(tex_eligible.astype(jnp.int32))
    branch = (jnp.where(pbr_any, 1, 0)
              + jnp.where(n_elig > CAPL, 1, 0))
    return jax.lax.switch(branch, [_tex_ident, _tex_sparse, _tex_full],
                          state)


def _texture_stage(scene, uniforms, static, cw, cs, o3, d3, t, tri_i,
                   u, v, depth, shp, state, mat_lane=None,
                   plain=None):
    """XLA texture pre-stage: run the REAL apply_pbr_textures over the raw
    hits and export the material-override planes the kernels consume
    (all six slots incl. normal maps and alpha modes). Returns
    (planes, state) — alpha-BLEND lanes consume one RNG draw
    (reference :6215), threaded through to S1's draw stream.

    Mixed primitive families (plain is not None): non-soup-triangle
    winners' tri ids index OTHER families' arrays, so their lanes are
    masked to miss (rec.hit False -> apply_pbr_textures' prim_type gate
    keeps them at identity) and the material gather uses the merged rows'
    true per-lane material id (mat_lane) instead of the triangle row's."""
    from metal_pathtracer_tpu.ops import bsdf as bsdf_ops
    from metal_pathtracer_tpu.ops import pbr_textures
    from metal_pathtracer_tpu.ops.traversal import _hit_record_from_best

    if plain is not None:
        tri_i = jnp.where(plain, tri_i, -1)
    rec = _hit_record_from_best(o3, d3, scene.triangles, t, tri_i, u, v)
    m = bsdf_ops.gather_material(
        scene.materials,
        jnp.clip(rec.material if mat_lane is None else mat_lane, 0,
                 scene.materials.count - 1))
    hit_world = jnp.maximum(t, 0.0) * jnp.sqrt(
        jnp.maximum(jnp.sum(d3 * d3, -1), 1e-12))
    cone_at_hit = jnp.maximum(cw + cs * hit_world, 1e-7)
    wo = -d3 / jnp.sqrt(jnp.maximum(jnp.sum(d3 * d3, -1,
                                            keepdims=True), 1e-38))
    texd = pbr_textures.apply_pbr_textures(
        scene, m, rec, wo, cone_at_hit, depth, state, static,
        uniforms, ray_d=d3)
    pbr_lane = ((m.mat_type == C.MATERIAL_PBR)
                & (rec.prim_type == C.PRIMITIVE_TRIANGLE))
    return jnp.stack([
        shp(texd.m.base_color[:, 0]), shp(texd.m.base_color[:, 1]),
        shp(texd.m.base_color[:, 2]),
        shp(texd.m.roughness), shp(texd.m.pbr_metallic),
        shp(texd.emissive[:, 0]), shp(texd.emissive[:, 1]),
        shp(texd.emissive[:, 2]),
        shp(texd.diffuse_occlusion),
        shp(texd.passthrough.astype(jnp.float32)),
        shp(texd.shading_normal[:, 0]), shp(texd.shading_normal[:, 1]),
        shp(texd.shading_normal[:, 2]),
        shp(texd.m.pbr_transmission),
        shp(pbr_lane.astype(jnp.float32))]), texd.state

"""Sparse-compacted texture stage vs the full-width stage.

The fused path's texture pre-stage (~25 gathers/lane) used to run at
full wavefront width for any chunk with >=1 PBR hit; round 5 compacts
the eligible lanes into a dense CAPL buffer (shade._texture_dispatch).
The contract vs the full-width stage: rng state and flag planes
(tpass/tpbr/tocc identity lanes) BIT-IDENTICAL; texture-sampled value
planes equal up to XLA shape-dependent rounding (the 4096-lane
compacted stage and the 8192-lane full stage compile to different
fusions — observed 1-ULP wobble on ~0.1% of sampled texels). Includes
the overflow (count > CAPL -> full) and empty (identity) branches —
pinned on a real textured scene's arrays with a synthetic wavefront
wide enough to exercise the sparse path (the fused frame tests run at
<= BLOCK lanes where the dispatch keeps the legacy two-way cond).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from metal_pathtracer_tpu import constants as C  # noqa: E402
from metal_pathtracer_tpu.ops.camera import build_camera  # noqa: E402
from metal_pathtracer_tpu.schema import (  # noqa: E402
    settings_to_static,
    settings_to_uniforms,
)


@pytest.fixture(scope="module")
def tex_fixture():
    from metal_pathtracer_tpu.utils.benchscene import build_bench_scene

    settings, res, environment = build_bench_scene(subdivisions=3)
    scene = res.build_arrays(environment=environment)
    w, h = 128, 64
    static = settings_to_static(settings, w, h,
                                res.material_types_present(),
                                res.texture_slots_present(),
                                res.texture_uses_uv1())
    camera = build_camera(settings, w, h)
    uniforms = settings_to_uniforms(settings, camera, 0, 0)
    return scene, static, uniforms


def _make_wavefront(scene, n, pbr_frac, seed=3):
    """Synthetic post-trace wavefront: hit lanes alternate between
    textured-PBR triangles and non-PBR triangles; some lanes miss."""
    rng = np.random.default_rng(seed)
    tri_mat = np.asarray(scene.triangles.material)
    mat_type = np.asarray(scene.materials.mat_type)
    pbr_tris = np.where(mat_type[tri_mat] == C.MATERIAL_PBR)[0]
    other_tris = np.where(mat_type[tri_mat] != C.MATERIAL_PBR)[0]
    assert len(pbr_tris) and len(other_tris)

    r = rng.random(n)
    tri = np.full(n, -1, np.int32)
    is_pbr = r < pbr_frac
    is_other = (r >= pbr_frac) & (r < pbr_frac + 0.3)
    tri[is_pbr] = rng.choice(pbr_tris, is_pbr.sum())
    tri[is_other] = rng.choice(other_tris, is_other.sum())
    # dead lanes carry tmax 0 into the trace and therefore MISS — a dead
    # lane with tri >= 0 cannot occur in the pipeline, so the synthetic
    # wavefront must not produce one either
    tri[:: 97] = -1
    alive = tri >= 0

    uv = rng.random((n, 2)).astype(np.float32) * 0.45 + 0.05
    t = np.where(tri >= 0, 1.0 + rng.random(n), 0.0).astype(np.float32)
    o3 = rng.normal(size=(n, 3)).astype(np.float32)
    d3 = rng.normal(size=(n, 3)).astype(np.float32)
    d3 /= np.linalg.norm(d3, axis=1, keepdims=True)
    mat_lane = np.where(tri >= 0, tri_mat[np.maximum(tri, 0)], 0
                        ).astype(np.int32)
    state = rng.integers(1, 2**32, n, dtype=np.uint64).astype(np.uint32)
    cw = np.full(n, 1e-3, np.float32)
    cs = np.full(n, 2e-3, np.float32)
    lane_pbr = mat_type[mat_lane] == C.MATERIAL_PBR
    eligible = alive & (tri >= 0) & lane_pbr
    return dict(o3=jnp.asarray(o3), d3=jnp.asarray(d3),
                t=jnp.asarray(t), tri=jnp.asarray(tri),
                u=jnp.asarray(uv[:, 0]), v=jnp.asarray(uv[:, 1]),
                mat_lane=jnp.asarray(mat_lane),
                state=jnp.asarray(state),
                cw=jnp.asarray(cw), cs=jnp.asarray(cs),
                eligible=jnp.asarray(eligible))


def _dispatch(scene, static, uniforms, wf, n, sparse, monkeypatch):
    from metal_pathtracer_tpu.ops.pallas import shade

    monkeypatch.setenv("MPT_TEX_SPARSE", sparse)
    nb = n // shade.BLOCK

    def shp(a):
        return a.reshape(nb, shade.ROWS, shade.LANES)

    planes, state = shade._texture_dispatch(
        scene, uniforms, static, wf["cw"], wf["cs"], wf["o3"], wf["d3"],
        wf["t"], wf["tri"], wf["u"], wf["v"], 1, shp, wf["state"],
        wf["mat_lane"], None, wf["eligible"], jnp.any(wf["eligible"]), n)
    return np.asarray(planes), np.asarray(state)


@pytest.mark.parametrize("pbr_frac,label", [
    (0.04, "sparse"),      # ~330 eligible of 8192 -> sparse branch
    (0.8, "overflow"),     # > CAPL eligible -> full-width fallback
    (0.0, "empty"),        # no eligible -> identity branch
])
def test_sparse_matches_full(tex_fixture, monkeypatch, pbr_frac, label):
    scene, static, uniforms = tex_fixture
    n = 8192  # 2 BLOCKs: CAPL = n/2 = 4096 < n exercises the switch
    wf = _make_wavefront(scene, n, pbr_frac)
    n_elig = int(np.asarray(wf["eligible"]).sum())
    if label == "sparse":
        assert 0 < n_elig <= 4096
    elif label == "overflow":
        assert n_elig > 4096

    p_full, s_full = _dispatch(scene, static, uniforms, wf, n, "0",
                               monkeypatch)
    p_sp, s_sp = _dispatch(scene, static, uniforms, wf, n, "2",
                           monkeypatch)
    np.testing.assert_array_equal(s_sp, s_full)
    # Every VALUE plane is consumed ONLY where tpbr (plane 14) is set:
    # the kernels select texture overrides per lane on the tpbr flag
    # (shade._shade_kernel material-fetch block), so on tpbr=0 lanes the
    # full stage carries material values / reconstruction garbage while
    # the sparse path's identity planes carry zeros — both dead values.
    # The flag planes themselves (tpass is consumed raw by the S2
    # nee_lanes mask, tpbr by the selects) must match EXACTLY everywhere:
    # both paths emit 0 on non-eligible lanes.
    from metal_pathtracer_tpu.ops.pallas.shade import TEX_IDX

    tpbr = p_full[TEX_IDX["tpbr"]] > 0.5
    for p in range(p_full.shape[0]):
        name = list(TEX_IDX)[p]
        a, b = p_sp[p], p_full[p]
        if name in ("tpass", "tpbr"):
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            a, b = np.where(tpbr, a, 0.0), np.where(tpbr, b, 0.0)
            np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6,
                                       err_msg=name)


def test_sparse_cap_rounding():
    """CAPL is BLOCK-aligned and the dispatch only engages when it
    actually shrinks the stage."""
    from metal_pathtracer_tpu.ops.pallas.shade import BLOCK

    for padded, div in [(8 * BLOCK, 8), (3 * BLOCK, 8), (BLOCK, 8)]:
        capl = max(BLOCK, -(-padded // div // BLOCK) * BLOCK)
        assert capl % BLOCK == 0
        assert capl >= BLOCK

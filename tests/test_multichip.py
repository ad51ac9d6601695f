"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The reference's closest analogue is the Embree-vs-Metal parity gate; ours
is bit-equality between 1-device and N-device renders (SURVEY.md §4).
"""

import jax
import numpy as np
import pytest

from metal_pathtracer_tpu.parallel import mesh as mesh_ops
from metal_pathtracer_tpu.renderer.accumulation import RenderState
from metal_pathtracer_tpu.renderer.frame import render_samples


def _build(width, height):
    import __graft_entry__
    return __graft_entry__._build(width, height)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_matches_single_chip(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    devices = jax.devices()[:n_devices]
    mesh = mesh_ops.make_mesh(devices)

    width, height = 16, 8 * n_devices
    scene, uniforms, static = _build(width, height)

    sharded = mesh_ops.shard_state(RenderState.create(width, height), mesh)
    out = mesh_ops.render_samples_sharded(
        mesh_ops.replicate(scene, mesh), mesh_ops.replicate(uniforms, mesh),
        sharded, static, 2, mesh, chunk=width * 8)

    single = render_samples(scene, uniforms, RenderState.create(width, height),
                            static, 2)

    np.testing.assert_array_equal(np.asarray(out.radiance_sum),
                                  np.asarray(single.radiance_sum))
    np.testing.assert_array_equal(np.asarray(out.sample_count),
                                  np.asarray(single.sample_count))
    # psum'd ray counters match the single-chip totals
    assert float(np.asarray(out.ray_count)) == pytest.approx(
        float(np.asarray(single.ray_count)))


def test_dryrun_entrypoint():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2)

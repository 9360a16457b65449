"""Multi-chip sharding on the 8-device CPU fake backend (SURVEY.md §4.4).

The sharded renderer must produce the same image as the single-device one:
tile banding + all-gather reseeding + light-slot psum are pure refactorings
of the math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.models import conemarch
from raytracing_engine_tpu.parallel import make_mesh, render_sharded, sharded_render_step


@pytest.fixture(scope="module")
def pose():
    return (
        jnp.array([0.5, -2.0, 0.25], jnp.float32),
        jnp.array([0.07, 0.1, -0.02, 0.99], jnp.float32) / jnp.sqrt(
            jnp.float32(0.07**2 + 0.1**2 + 0.02**2 + 0.99**2)
        ),
    )


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("tiles,samples", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(small_cfg, scene, pose, tiles, samples):
    pos, quat = pose
    want = np.asarray(conemarch.render_jit(small_cfg, scene, pos, quat))
    mesh = make_mesh(tiles, samples)
    got = np.asarray(render_sharded(small_cfg, scene, pos, quat, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_step_jits(small_cfg, scene, pose):
    pos, quat = pose
    step = sharded_render_step(small_cfg, make_mesh(4, 2))
    img = jax.block_until_ready(step(scene, pos, quat))
    assert img.shape == (small_cfg.height, small_cfg.width, 3)
    assert bool(jnp.isfinite(img).all())


def test_divisibility_validation(small_cfg, scene, pose):
    pos, quat = pose
    mesh = make_mesh(4, 2)
    from raytracing_engine_tpu.parallel.sharding import _check_divisibility

    with pytest.raises(ValueError):
        _check_divisibility(small_cfg, 3, 2)  # 8 rows not divisible by 3


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.parametrize("tiles,samples", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_instanced_sharded_matches_single_device(tiles, samples):
    """Sharded instanced render: tile bands bit-identical (hard shadows);
    sample-sharded soft shadows match to float-summation tolerance."""
    from raytracing_engine_tpu.accel import build_bvh, icosphere
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import grid_instances
    from raytracing_engine_tpu.models.instanced import render_instanced_phong
    from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
        pack_instances,
    )
    from raytracing_engine_tpu.parallel import (
        make_mesh,
        render_instanced_sharded,
    )

    mesh_tris = icosphere(subdivisions=1, radius=1.2, center=(0.0, 5.0, 0.0))
    bvh = build_bvh(mesh_tris)
    cs = build_clusters(mesh_tris, bvh=bvh)
    inst = grid_instances(bvh, nx=2, ny=2, spacing=2.5, base=(0.0, 7.0, 0.0))
    tab = pack_instances(inst)
    mat_albedo = jnp.asarray(np.array([[0.8, 0.6, 0.4]], np.float32))
    cam = jnp.zeros(3)
    light = jnp.asarray([0.0, 3.0, 5.0])
    kw = dict(width=64, height=32, light_color=(80.0, 80.0, 70.0))
    dev_mesh = make_mesh(tiles, samples)

    # hard shadows: the samples axis is pure replication, so the psum
    # average is mathematically exact — but each (tiles, samples) config
    # is a different XLA program whose fusion/FMA choices may differ by an
    # ulp, so assert ulp-level closeness rather than bitwise equality
    want = render_instanced_phong(tab, cs, inst.mat, mat_albedo, cam,
                                  jnp.float32(0.0), light, **kw)
    got = render_instanced_sharded(tab, cs, inst.mat, mat_albedo, cam,
                                   jnp.float32(0.0), light, mesh=dev_mesh,
                                   **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-7, atol=1e-6)

    # soft shadows: devices slice the same global sample set; the affine
    # radiance average reassociates one float sum -> tolerance, not bitwise
    soft = dict(light_radius=1.0, shadow_samples=8)
    want_s = render_instanced_phong(tab, cs, inst.mat, mat_albedo, cam,
                                    jnp.float32(0.0), light, **kw, **soft)
    got_s = render_instanced_sharded(tab, cs, inst.mat, mat_albedo, cam,
                                     jnp.float32(0.0), light, mesh=dev_mesh,
                                     **kw, **soft)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-6, atol=1e-6)

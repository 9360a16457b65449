"""Sharded path tracing vs single-device (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.parallel import make_mesh
from raytracing_engine_tpu.parallel.pt_sharding import render_pt_sharded, sharded_pt_step
from raytracing_engine_tpu.pathtracer import PTConfig, render_pt
from raytracing_engine_tpu.pathtracer.scenes import material_spheres

KEY = jax.random.PRNGKey(21)


@pytest.fixture(scope="module")
def setup():
    cfg = PTConfig(width=32, height=24, max_bounces=2)
    scene = material_spheres()
    pos = jnp.zeros(3)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    want, want_rays = render_pt(cfg, scene, pos, quat, 8, KEY)
    return cfg, scene, pos, quat, np.asarray(want), float(want_rays)


@pytest.mark.parametrize("tiles,samples", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_pt_matches_single(setup, tiles, samples):
    cfg, scene, pos, quat, want, want_rays = setup
    mesh = make_mesh(tiles, samples)
    got, nrays = render_pt_sharded(cfg, scene, pos, quat, 8, KEY, mesh)
    # same sample set; only float summation order differs across shardings
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    assert abs(float(nrays) - want_rays) < 1e-3


def test_sharded_pt_step_jits(setup):
    cfg, scene, pos, quat, want, _ = setup
    step = sharded_pt_step(cfg, 8, make_mesh(4, 2))
    img, _ = step(scene, pos, quat, KEY)
    np.testing.assert_allclose(np.asarray(img), want, rtol=1e-5, atol=1e-6)


def test_spp_divisibility_error(setup):
    cfg, scene, pos, quat, _, _ = setup
    with pytest.raises(ValueError):
        render_pt_sharded(cfg, scene, pos, quat, 7, KEY, make_mesh(1, 8))


def test_sharded_soa_pcg_matches_unsharded(setup):
    """Counter-based RNG: sharded soa render equals render_pt_fast exactly
    (up to psum reassociation)."""
    from raytracing_engine_tpu.pathtracer.wavefront import render_pt_fast
    import dataclasses

    cfg, scene, pos, quat, _, _ = setup
    cfg = dataclasses.replace(cfg, rng="pcg")
    want, _ = render_pt_fast(cfg, scene, pos, quat, 8, KEY)
    got, _ = render_pt_sharded(cfg, scene, pos, quat, 8, KEY,
                               make_mesh(4, 2), soa=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

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

"""Ray compaction preserves the estimator exactly (sort + scatter bookkeeping)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.pathtracer import PTConfig
from raytracing_engine_tpu.pathtracer.compaction import (
    apply_perm,
    compacted_trace,
    compaction_perm,
    scatter_by_pixel,
)
from raytracing_engine_tpu.pathtracer.scenes import cornell_box, material_spheres
from raytracing_engine_tpu.pathtracer.wavefront import render_pt_fast

KEY = jax.random.PRNGKey(9)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])


def test_perm_mechanics():
    alive = jnp.array([0, 1, 0, 1, 1, 0], jnp.float32)
    perm, n = compaction_perm(alive)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(alive[perm]), [1, 1, 1, 0, 0, 0])
    # stability: live lanes keep order 1,3,4
    np.testing.assert_array_equal(np.asarray(perm)[:3], [1, 3, 4])
    state = {"x": jnp.arange(6.0), "v": jnp.arange(12.0).reshape(6, 2)}
    out = apply_perm(state, perm)
    np.testing.assert_array_equal(np.asarray(out["x"])[:3], [1, 3, 4])


def test_scatter_roundtrip():
    vals = jnp.arange(12.0).reshape(4, 3)
    pix = jnp.array([2, 0, 3, 1])
    out = scatter_by_pixel(vals, pix, 4)
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(vals[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(vals[3]))


def test_compacted_equals_uncompacted():
    """Same pcg stream, compaction on vs off: identical images."""
    cfg = PTConfig(width=32, height=16, max_bounces=3, rng="pcg")
    for scene_fn, pos in [(material_spheres, jnp.zeros(3)),
                          (cornell_box, jnp.array([0.0, 0.2, 0.0]))]:
        scene = scene_fn()
        want, n_want = render_pt_fast(cfg, scene, pos, QUAT, 2, KEY)
        got, n_got = jax.jit(
            lambda s, p: compacted_trace(cfg, s, p, QUAT, KEY, spp=2),
            static_argnums=(),
        )(scene, pos)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )
        assert abs(float(n_want) - float(n_got)) < 1e-3

"""BVH build + traversal vs brute-force Möller–Trumbore ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.accel import build_bvh, bvh_intersect, icosphere, torus_knot
from raytracing_engine_tpu.pathtracer.intersect import ray_triangle


@pytest.fixture(scope="module")
def mesh():
    return icosphere(subdivisions=2, radius=1.0, center=(0.0, 4.0, 0.0))  # 320 tris


@pytest.fixture(scope="module")
def bvh(mesh):
    return build_bvh(mesh)


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    target = np.array([0.0, 4.0, 0.0]) + rng.normal(size=(n, 3)) * 1.2
    d = (target - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_structure(bvh, mesh):
    n = bvh.bb_min.shape[0]
    assert bvh.v0.shape[0] == mesh.shape[0]
    # skip links are strictly increasing targets within bounds
    skip = np.asarray(bvh.skip)
    assert (skip > np.arange(n)).all() and (skip <= n).all()
    # every triangle appears exactly once in the reorder
    assert sorted(np.asarray(bvh.perm).tolist()) == list(range(mesh.shape[0]))


def test_bvh_matches_bruteforce(bvh, mesh):
    o, d = _random_rays(256)
    t_bvh, idx, _, _ = bvh_intersect(bvh, o, d)
    v0 = jnp.asarray(mesh[:, 0])
    e1 = jnp.asarray(mesh[:, 1] - mesh[:, 0])
    e2 = jnp.asarray(mesh[:, 2] - mesh[:, 0])
    t_all, _, _ = ray_triangle(o, d, v0, e1, e2)
    t_brute = jnp.min(t_all, axis=-1)
    np.testing.assert_allclose(
        np.asarray(t_bvh), np.asarray(t_brute), rtol=1e-4, atol=1e-5
    )


def test_bvh_miss_is_inf(bvh):
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])  # away from the mesh
    t, idx, _, _ = bvh_intersect(bvh, o, d)
    assert np.isinf(float(t[0])) and int(idx[0]) == -1


def test_bvh_any_hit_consistent(bvh):
    o, d = _random_rays(128, seed=3)
    t_closest, _, _, _ = bvh_intersect(bvh, o, d)
    t_any, idx_any, _, _ = bvh_intersect(bvh, o, d, any_hit=True)
    hit_c = np.isfinite(np.asarray(t_closest))
    hit_a = np.asarray(idx_any) >= 0
    np.testing.assert_array_equal(hit_c, hit_a)


def test_bvh_under_jit(bvh):
    o, d = _random_rays(64, seed=5)
    f = jax.jit(lambda o, d: bvh_intersect(bvh, o, d)[0])
    t1 = f(o, d)
    t2 = bvh_intersect(bvh, o, d)[0]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))


def test_torus_knot_tri_count():
    m = torus_knot(segments=1100, sides=32)
    assert m.shape[0] == 2 * 1100 * 32  # 70400 — BVH bench scale
    assert np.isfinite(m).all()


def test_bigger_mesh_bvh_depth():
    m = torus_knot(segments=120, sides=16)  # 3840 tris
    b = build_bvh(m)
    o, d = _random_rays(64, seed=9)
    # aim at the knot's bounding volume
    t, idx, _, _ = bvh_intersect(b, jnp.zeros_like(o) + jnp.array([0., -6., 0.]),
                                 jnp.asarray(
                                     (np.array([0, 6, 0]) - np.asarray(o) * 0)
                                     / np.linalg.norm([0, 6, 0])
                                 ).astype(jnp.float32) * jnp.ones_like(d))
    assert np.isfinite(np.asarray(t)).any()

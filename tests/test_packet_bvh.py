"""Packet BVH traversal (Pallas, interpret mode) vs gather traversal."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: compile-heavy

from raytracing_engine_tpu.accel import build_bvh, bvh_intersect, icosphere
from raytracing_engine_tpu.ops.pallas.bvh_traverse import (
    bvh_intersect_packet,
    pack_bvh_tables,
)


@pytest.fixture(scope="module")
def setup():
    mesh = icosphere(subdivisions=2, radius=1.2, center=(0.0, 5.0, 0.0))
    bvh = build_bvh(mesh)
    return bvh, pack_bvh_tables(bvh)


def _ray_grid(h, w, seed=0):
    """A (h, w) plane grid of rays roughly aimed at the mesh."""
    rng = np.random.default_rng(seed)
    ox = np.zeros((h, w), np.float32)
    oy = np.zeros((h, w), np.float32)
    oz = np.zeros((h, w), np.float32)
    tx = rng.normal(0.0, 1.6, size=(h, w)).astype(np.float32)
    ty = np.full((h, w), 5.0, np.float32) + rng.normal(0, 1.0, (h, w)).astype(np.float32)
    tz = rng.normal(0.0, 1.6, size=(h, w)).astype(np.float32)
    n = np.sqrt(tx * tx + ty * ty + tz * tz)
    return ((jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oz)),
            (jnp.asarray(tx / n), jnp.asarray(ty / n), jnp.asarray(tz / n)))


def test_packet_matches_gather_closest(setup):
    bvh, tables = setup
    o, d = _ray_grid(16, 128)
    t_p, idx_p = bvh_intersect_packet(
        tables, o, d, jnp.full((16, 128), jnp.inf), interpret=True
    )
    o3 = jnp.stack(o, -1).reshape(-1, 3)
    d3 = jnp.stack(d, -1).reshape(-1, 3)
    t_g, idx_g, _, _ = bvh_intersect(bvh, o3, d3)
    np.testing.assert_allclose(
        np.asarray(t_p).ravel(), np.asarray(t_g), rtol=1e-5, atol=1e-6
    )
    # same triangles found (where hit)
    hit = np.isfinite(np.asarray(t_g))
    np.testing.assert_array_equal(
        np.asarray(idx_p).ravel()[hit], np.asarray(idx_g)[hit]
    )
    assert hit.mean() > 0.2


def test_packet_any_hit(setup):
    bvh, tables = setup
    o, d = _ray_grid(16, 128, seed=3)
    t_c, idx_c = bvh_intersect_packet(
        tables, o, d, jnp.full((16, 128), jnp.inf), interpret=True
    )
    t_a, idx_a = bvh_intersect_packet(
        tables, o, d, jnp.full((16, 128), jnp.inf), any_hit=True, interpret=True
    )
    hit_c = np.isfinite(np.asarray(t_c))
    hit_a = np.asarray(idx_a) >= 0
    np.testing.assert_array_equal(hit_c, hit_a)


def test_packet_respects_tmax(setup):
    bvh, tables = setup
    o, d = _ray_grid(16, 128, seed=5)
    t_c, _ = bvh_intersect_packet(
        tables, o, d, jnp.full((16, 128), jnp.inf), interpret=True
    )
    # cut off before the mesh: nothing may be found
    t_cut, idx_cut = bvh_intersect_packet(
        tables, o, d, jnp.full((16, 128), 2.0), interpret=True
    )
    assert (np.asarray(idx_cut) == -1).all()
    # cut off beyond: identical to closest
    t_far, _ = bvh_intersect_packet(
        tables, o, d, jnp.full((16, 128), 1e9), interpret=True
    )
    np.testing.assert_allclose(np.asarray(t_far), np.asarray(t_c), rtol=1e-6)

"""Instanced cluster kernel (interpret) vs gather-based two-level traversal."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.accel import build_bvh, icosphere
from raytracing_engine_tpu.accel.clusters import build_clusters
from raytracing_engine_tpu.accel.instancing import grid_instances, instanced_intersect
from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
    instanced_cluster_intersect,
    pack_instances,
)


@pytest.fixture(scope="module")
def setup():
    mesh = icosphere(subdivisions=2, radius=0.8)
    bvh = build_bvh(mesh)
    cs = build_clusters(mesh)
    inst = grid_instances(bvh, nx=3, ny=2, spacing=2.5, base=(0.0, 8.0, 0.0))
    return mesh, inst, cs, pack_instances(inst)


def _ray_grid(h, w, seed=0):
    rng = np.random.default_rng(seed)
    o = tuple(jnp.zeros((h, w)) for _ in range(3))
    tx = rng.normal(0.0, 3.0, size=(h, w)).astype(np.float32)
    ty = np.full((h, w), 9.0, np.float32) + rng.normal(0, 2.0, (h, w)).astype(np.float32)
    tz = rng.normal(0.5, 1.5, size=(h, w)).astype(np.float32)
    n = np.sqrt(tx * tx + ty * ty + tz * tz)
    return o, (jnp.asarray(tx / n), jnp.asarray(ty / n), jnp.asarray(tz / n))


def test_instanced_kernel_matches_gather(setup):
    mesh, inst, cs, tab = setup
    o, d = _ray_grid(16, 128)
    t_k, code = instanced_cluster_intersect(tab, cs, o, d, interpret=True)

    o3 = jnp.stack(o, -1)
    d3 = jnp.stack(d, -1)
    t_g, gi, gt, _ = instanced_intersect(inst, o3, d3)
    np.testing.assert_allclose(
        np.asarray(t_k), np.asarray(t_g), rtol=2e-4, atol=2e-4
    )
    hit = np.isfinite(np.asarray(t_g))
    assert hit.any()
    # instance decoding agrees
    inst_k = np.asarray(code)[hit] // cs.padded_tris
    np.testing.assert_array_equal(inst_k, np.asarray(gi)[hit])


def test_instanced_kernel_miss_is_clean(setup):
    mesh, inst, cs, tab = setup
    o = tuple(jnp.zeros((8, 128)) for _ in range(3))
    d = (jnp.zeros((8, 128)), jnp.full((8, 128), -1.0), jnp.zeros((8, 128)))
    t, code = instanced_cluster_intersect(tab, cs, o, d, interpret=True)
    assert np.isinf(np.asarray(t)).all()
    assert (np.asarray(code) == -1).all()

"""Two-level BVH instancing vs flattened ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.accel import build_bvh, icosphere
from raytracing_engine_tpu.accel.instancing import (
    grid_instances,
    instanced_intersect,
    make_instances,
)
from raytracing_engine_tpu.pathtracer.intersect import ray_triangle


@pytest.fixture(scope="module")
def base_mesh():
    return icosphere(subdivisions=2, radius=0.8)  # 320 tris at origin


@pytest.fixture(scope="module")
def inst(base_mesh):
    bvh = build_bvh(base_mesh)
    return grid_instances(bvh, nx=3, ny=2, spacing=2.5, base=(0.0, 8.0, 0.0))


def _flatten(base_mesh, inst):
    """World-space copy of every instance's triangles (ground truth)."""
    out = []
    for k in range(inst.num_instances):
        r = np.asarray(inst.rot[k])
        t = np.asarray(inst.trans[k])
        s = float(inst.scale[k])
        out.append(base_mesh @ r.T * s + t)
    return np.concatenate(out)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.2
    tgt = np.array([0.0, 9.0, 0.5]) + rng.normal(size=(n, 3)) * 3.0
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_instanced_matches_flattened(base_mesh, inst):
    o, d = _rays(256)
    t_inst, i_inst, _, _ = instanced_intersect(inst, o, d)

    flat = _flatten(base_mesh, inst)
    v0 = jnp.asarray(flat[:, 0])
    e1 = jnp.asarray(flat[:, 1] - flat[:, 0])
    e2 = jnp.asarray(flat[:, 2] - flat[:, 0])
    tt, _, _ = ray_triangle(o, d, v0, e1, e2)
    t_flat = jnp.min(tt, axis=-1)

    np.testing.assert_allclose(
        np.asarray(t_inst), np.asarray(t_flat), rtol=2e-4, atol=2e-4
    )
    # at least some rays hit (scene aimed at; spheres are small in the grid)
    assert np.isfinite(np.asarray(t_inst)).mean() > 0.05


def test_instance_aabbs_contain_mesh(base_mesh, inst):
    flat = _flatten(base_mesh, inst)
    k = 0
    per = base_mesh.shape[0]
    for k in range(inst.num_instances):
        chunk = flat[k * per : (k + 1) * per].reshape(-1, 3)
        lo = np.asarray(inst.aabb_min[k])
        hi = np.asarray(inst.aabb_max[k])
        assert (chunk.min(0) >= lo - 1e-4).all()
        assert (chunk.max(0) <= hi + 1e-4).all()


def test_total_triangle_accounting(inst):
    assert inst.total_triangles == 6 * 320


def test_normals_unit_and_world(inst):
    o, d = _rays(64, seed=2)
    t, ii, ti, n = instanced_intersect(inst, o, d)
    hit = np.isfinite(np.asarray(t))
    nn = np.asarray(n)[hit]
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-5)

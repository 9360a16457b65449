"""Instanced cluster kernel (interpret) vs gather-based two-level traversal."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: compile-heavy

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


def test_instanced_attrs_normals_match_gather(setup):
    """attrs=True world normals agree with the gather two-level path."""
    mesh, inst, cs, tab = setup
    o, d = _ray_grid(16, 128, seed=3)
    t_k, code, nx, ny, nz = instanced_cluster_intersect(
        tab, cs, o, d, attrs=True, interpret=True)

    o3 = jnp.stack(o, -1)
    d3 = jnp.stack(d, -1)
    t_g, gi, gt, n_g = instanced_intersect(inst, o3, d3)
    hit = np.isfinite(np.asarray(t_g))
    assert hit.any()
    n_k = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], -1)
    n_k = n_k / np.maximum(np.linalg.norm(n_k, axis=-1, keepdims=True), 1e-20)
    # same triangle -> same unoriented geometric normal
    dots = np.abs((n_k[hit] * np.asarray(n_g)[hit]).sum(-1))
    assert (dots > 1.0 - 1e-4).mean() > 0.995  # edge/tie hits may differ


def test_instanced_any_hit_tmax(setup):
    """any_hit with a t_max cutoff: occluded only when a hit lies closer."""
    mesh, inst, cs, tab = setup
    o, d = _ray_grid(8, 128, seed=5)
    t_k, _ = instanced_cluster_intersect(tab, cs, o, d, interpret=True)
    t_np = np.asarray(t_k)
    hit = np.isfinite(t_np)

    _, code_far = instanced_cluster_intersect(
        tab, cs, o, d, any_hit=True, t_max=1e9, interpret=True)
    np.testing.assert_array_equal(np.asarray(code_far) >= 0, hit)

    # cutoff below every hit distance -> nothing occludes
    tmin_cut = np.where(hit, t_np, np.inf).min() * 0.5
    _, code_near = instanced_cluster_intersect(
        tab, cs, o, d, any_hit=True, t_max=tmin_cut, interpret=True)
    assert (np.asarray(code_near) == -1).all()


def test_render_instanced_phong(setup):
    """Shaded instanced frame: hits lit, misses black, shadows darken."""
    from raytracing_engine_tpu.models.instanced import render_instanced_phong

    mesh, inst, cs, tab = setup
    mat_albedo = jnp.asarray(np.array([[0.8, 0.6, 0.4]], np.float32))
    kw = dict(width=128, height=64, interpret=True,
              light_color=(120.0, 120.0, 110.0))
    cam = jnp.zeros(3)
    img = render_instanced_phong(
        tab, cs, inst.mat, mat_albedo, cam, jnp.float32(0.0),
        jnp.asarray([0.0, 4.0, 6.0]), shadows=True, **kw)
    img_ns = render_instanced_phong(
        tab, cs, inst.mat, mat_albedo, cam, jnp.float32(0.0),
        jnp.asarray([0.0, 4.0, 6.0]), shadows=False, **kw)
    a = np.asarray(img)
    b = np.asarray(img_ns)
    assert np.isfinite(a).all()
    assert (a > 0).any(), "some pixels lit"
    assert (a <= b + 1e-6).all(), "shadows only remove light"
    assert (a < b - 1e-4).any(), "instances shadow each other somewhere"


def test_render_instanced_soft_shadows(setup):
    """Area-light shadow sampling: radius 0 equals the hard-shadow path
    exactly; a finite radius produces fractional penumbra visibility
    (pixels strictly between fully-lit and fully-shadowed)."""
    from raytracing_engine_tpu.models.instanced import render_instanced_phong

    mesh, inst, cs, tab = setup
    mat_albedo = jnp.asarray(np.array([[0.8, 0.6, 0.4]], np.float32))
    kw = dict(width=128, height=64, interpret=True,
              light_color=(120.0, 120.0, 110.0))
    cam = jnp.zeros(3)
    light = jnp.asarray([0.0, 4.0, 6.0])
    hard = render_instanced_phong(
        tab, cs, inst.mat, mat_albedo, cam, jnp.float32(0.0), light,
        shadows=True, **kw)
    hard2 = render_instanced_phong(
        tab, cs, inst.mat, mat_albedo, cam, jnp.float32(0.0), light,
        shadows=True, light_radius=0.0, shadow_samples=4, **kw)
    # radius 0 with N>1 samples falls back to the single hard launch
    np.testing.assert_array_equal(np.asarray(hard), np.asarray(hard2))

    soft = render_instanced_phong(
        tab, cs, inst.mat, mat_albedo, cam, jnp.float32(0.0), light,
        shadows=True, light_radius=1.5, shadow_samples=8, **kw)
    none = render_instanced_phong(
        tab, cs, inst.mat, mat_albedo, cam, jnp.float32(0.0), light,
        shadows=False, **kw)
    s, h, n = np.asarray(soft), np.asarray(hard), np.asarray(none)
    assert np.isfinite(s).all()
    assert (s <= n + 1e-5).all(), "soft shadows only remove light"
    # penumbra: some pixels strictly between the hard shadow's two states
    mid = (s > h + 1e-4) & (s < n - 1e-4)
    assert mid.any(), "a finite light radius must produce partial visibility"

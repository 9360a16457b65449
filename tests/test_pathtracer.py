"""Path tracer correctness: analytic anchors + cross-estimator agreement.

The north-star path tracer has no upstream reference; correctness rests on
physics invariants (furnace test), estimator cross-checks (NEE+MIS vs brute
BSDF-only must converge to the same mean), and determinism.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.pathtracer import PTConfig, render_pt
from raytracing_engine_tpu.pathtracer.intersect import ray_sphere, ray_triangle
from raytracing_engine_tpu.pathtracer.scenes import (
    cornell_box,
    furnace_scene,
    material_spheres,
)

KEY = jax.random.PRNGKey(7)


# ---------------------------------------------------------------- intersect


def test_ray_sphere_analytic():
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t = ray_sphere(o, d, jnp.array([[0.0, 5.0, 0.0]]), jnp.array([1.0]))
    np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-5)


def test_ray_sphere_inside_hits_far_wall():
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t = ray_sphere(o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0]))
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-5)


def test_ray_sphere_miss():
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t = ray_sphere(o, d, jnp.array([[10.0, 5.0, 0.0]]), jnp.array([1.0]))
    assert np.isinf(float(t[0]))


def test_ray_triangle_analytic():
    v0 = jnp.array([[-1.0, 3.0, -1.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 0.0, 2.0]])
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t, u, v = ray_triangle(o, d, v0, e1, e2)
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(float(u[0]), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(v[0]), 0.5, rtol=1e-5)


def test_ray_triangle_outside_misses():
    v0 = jnp.array([[-1.0, 3.0, -1.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 0.0, 2.0]])
    o = jnp.array([5.0, 0.0, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t, _, _ = ray_triangle(o, d, v0, e1, e2)
    assert np.isinf(float(t[0]))


# --------------------------------------------------------------- integrator


@pytest.fixture(scope="module")
def furnace_render():
    cfg = PTConfig(width=64, height=48, max_bounces=3)
    scene = furnace_scene(albedo=0.5, le=1.0)
    img, nrays = render_pt(cfg, scene, jnp.zeros(3),
                           jnp.array([0.0, 0.0, 0.0, 1.0]), 96, KEY)
    return np.asarray(img), float(nrays)


def test_furnace_enclosure_reads_le(furnace_render):
    img, _ = furnace_render
    # corner pixels see the emissive enclosure directly -> exactly Le = 1
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]])
    np.testing.assert_allclose(corners, 1.0, atol=1e-4)


def test_furnace_sphere_reflects_albedo_times_le(furnace_render):
    img, _ = furnace_render
    # center pixels see the albedo-0.5 sphere: expected radiance 0.5 * Le
    h, w, _ = img.shape
    patch = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2]
    assert abs(patch.mean() - 0.5) < 0.03, patch.mean()


def test_rays_counted(furnace_render):
    _, nrays = furnace_render
    assert nrays > 64 * 48 * 96  # at least one ray per sample


def test_deterministic_same_key():
    cfg = PTConfig(width=16, height=16, max_bounces=2)
    scene = material_spheres()
    a, _ = render_pt(cfg, scene, jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0]), 4, KEY)
    b, _ = render_pt(cfg, scene, jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0]), 4, KEY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nee_and_brute_agree():
    """NEE+MIS and BSDF-only sampling estimate the same integral."""
    scene = material_spheres()
    pos = jnp.zeros(3)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    cfg_nee = PTConfig(width=32, height=24, max_bounces=3, use_nee=True)
    cfg_brute = PTConfig(width=32, height=24, max_bounces=3, use_nee=False)
    img_nee, _ = render_pt(cfg_nee, scene, pos, quat, 512, KEY)
    img_brute, _ = render_pt(cfg_brute, scene, pos, quat, 2048, jax.random.PRNGKey(3))
    m_nee = float(jnp.mean(img_nee))
    m_brute = float(jnp.mean(img_brute))
    assert abs(m_nee - m_brute) / max(m_nee, 1e-6) < 0.05, (m_nee, m_brute)


def test_cornell_box_renders():
    cfg = PTConfig(width=32, height=32, max_bounces=4)
    scene = cornell_box()
    # camera at the open front of the box looking +Y
    img, _ = render_pt(cfg, scene, jnp.array([0.0, 0.2, 0.0]),
                       jnp.array([0.0, 0.0, 0.0, 1.0]), 32, KEY)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # lit
    # left half reddish vs right half greenish (wall bleed)
    left = img[:, : img.shape[1] // 4]
    right = img[:, -img.shape[1] // 4 :]
    assert left[..., 0].mean() > left[..., 1].mean()
    assert right[..., 1].mean() > right[..., 0].mean()


def test_radiance_nonnegative_finite():
    cfg = PTConfig(width=16, height=16, max_bounces=4)
    scene = cornell_box()
    img, _ = render_pt(cfg, scene, jnp.array([0.0, 0.2, 0.0]),
                       jnp.array([0.0, 0.0, 0.0, 1.0]), 8, KEY)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert (img >= 0).all()

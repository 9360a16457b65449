"""Homogeneous fog: Beer-Lambert exactness + estimator consistency."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.pathtracer import PTConfig, render_pt_fast
from raytracing_engine_tpu.pathtracer.integrator import render_pt
from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

KEY = jax.random.PRNGKey(8)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])
POS = jnp.zeros(3)


def test_fog_transmittance_exact():
    """An emissive wall at distance d reads T*Le + (1-T)*fog_color with
    T = exp(-sigma*d) exactly (direct visibility, no MC noise)."""
    le, d, sigma = 4.0, 10.0, 0.08
    scene = build_pt_scene(
        spheres=[((0.0, d + 1000.0, 0.0), 1000.0, 0)],  # wall at y=d
        materials=[{"albedo": (0, 0, 0), "emission": (le,) * 3,
                    "kind": DIFFUSE}])
    cfg = PTConfig(width=16, height=12, max_bounces=0,
                   fog_density=sigma, fog_color=(0.3, 0.3, 0.3))
    img, _ = render_pt(cfg, scene, POS, QUAT, 4, KEY)
    t_exp = np.exp(-sigma * d)
    want = t_exp * le + (1 - t_exp) * 0.3
    # center pixel: ray ~straight ahead, distance ~d
    got = float(np.asarray(img)[6, 8, 0])
    assert abs(got - want) / want < 0.01, (got, want)


def test_fog_swallows_escapes():
    """Escaped rays are fully fogged: an env-lit empty scene reads the
    fog color, not the env."""
    scene = build_pt_scene(env=(1.0, 1.0, 1.0))
    cfg = PTConfig(width=8, height=8, max_bounces=1,
                   fog_density=0.1, fog_color=(0.2, 0.4, 0.6))
    img, _ = render_pt(cfg, scene, POS, QUAT, 2, KEY)
    np.testing.assert_allclose(np.asarray(img),
                               np.broadcast_to((0.2, 0.4, 0.6), (8, 8, 3)),
                               atol=1e-4)


def test_fog_off_is_bitexact():
    scene = build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 1.0, 0)],
        materials=[{"albedo": (0.5, 0.5, 0.5), "kind": DIFFUSE}],
        env=(1.0, 1.0, 1.0))
    cfg0 = PTConfig(width=16, height=12, max_bounces=2)
    cfg1 = PTConfig(width=16, height=12, max_bounces=2, fog_density=0.0,
                    fog_color=(9.0, 9.0, 9.0))
    a, _ = render_pt(cfg0, scene, POS, QUAT, 4, KEY)
    b, _ = render_pt(cfg1, scene, POS, QUAT, 4, KEY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fog_nee_and_brute_agree():
    """With fog, NEE (with shadow-segment transmittance) and brute-force
    BSDF sampling stay the same estimator."""
    mats = [
        {"albedo": (0.6, 0.6, 0.6), "kind": DIFFUSE},
        {"albedo": (0, 0, 0), "emission": (30.0,) * 3, "kind": DIFFUSE},
    ]
    scene = build_pt_scene(
        spheres=[((0.0, 6.0, -101.0), 100.0, 0), ((2.0, 4.0, 2.5), 0.7, 1)],
        materials=mats)
    cfg = PTConfig(width=24, height=16, max_bounces=2,
                   fog_density=0.03, fog_color=(0.05, 0.05, 0.05))
    nee, _ = render_pt(cfg, scene, POS, QUAT, 256, KEY)
    brute, _ = render_pt(dataclasses.replace(cfg, use_nee=False,
                                             max_bounces=4),
                         scene, POS, QUAT, 2048, jax.random.PRNGKey(12))
    a, b = np.asarray(nee), np.asarray(brute)
    assert abs(a.mean() - b.mean()) / b.mean() < 0.03, (a.mean(), b.mean())


def test_fog_wavefront_matches_reference():
    mats = [
        {"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
        {"albedo": (0, 0, 0), "emission": (20.0,) * 3, "kind": DIFFUSE},
    ]
    scene = build_pt_scene(
        spheres=[((0.0, 6.0, -101.0), 100.0, 0), ((2.0, 4.0, 2.5), 0.7, 1)],
        materials=mats, env=(0.4, 0.4, 0.5))
    cfg = PTConfig(width=32, height=24, max_bounces=3,
                   fog_density=0.05, fog_color=(0.1, 0.12, 0.15))
    a, _ = render_pt(cfg, scene, POS, QUAT, 16, KEY)
    b, _ = render_pt_fast(cfg, scene, POS, QUAT, 16, KEY)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() < 6e-3
    assert abs(a.mean() - b.mean()) < 1e-4

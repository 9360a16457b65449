"""Power-weighted NEE light selection: pdf table, unbiasedness, variance."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.pathtracer import PTConfig, render_pt_fast
from raytracing_engine_tpu.pathtracer.integrator import render_pt
from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene
from raytracing_engine_tpu.pathtracer.scenes import cornell_box

KEY = jax.random.PRNGKey(4)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])
POS = jnp.zeros(3)


def two_light_scene():
    """Floor lit by two lights BEHIND the camera (no direct hits — the
    floor's radiance is NEE-driven): a big dim panel and a small bright
    sphere carrying ~94% of the power."""
    mats = [
        {"albedo": (0.6, 0.6, 0.6), "kind": DIFFUSE},
        {"albedo": (0, 0, 0), "emission": (0.2,) * 3, "kind": DIFFUSE},
        {"albedo": (0, 0, 0), "emission": (300.0,) * 3, "kind": DIFFUSE},
    ]
    return build_pt_scene(
        spheres=[((0.0, 8.0, -101.0), 100.0, 0),      # floor ahead
                 ((-3.0, -2.0, 4.0), 3.0, 1),         # big dim, behind
                 ((3.0, -2.0, 4.0), 0.3, 2)],         # small bright, behind
        materials=mats)


def test_pick_table_proportional_to_power():
    scene = two_light_scene()
    pick = np.asarray(scene.light_pick)
    area_dim, area_bright = 4 * np.pi * 9.0, 4 * np.pi * 0.09
    p_dim, p_bright = area_dim * 0.2, area_bright * 300.0
    want = np.array([p_dim, p_bright]) / (p_dim + p_bright)
    np.testing.assert_allclose(pick[:2], want, rtol=1e-5)
    np.testing.assert_allclose(float(np.asarray(scene.light_cdf)[-1]), 1.0)


def test_power_unbiased_and_lower_variance():
    scene = two_light_scene()
    cfg = PTConfig(width=32, height=24, max_bounces=1, rng="pcg")
    ref, _ = render_pt_fast(
        dataclasses.replace(cfg, light_sampling="uniform"),
        scene, POS, QUAT, 1024, jax.random.PRNGKey(9))
    ref = np.asarray(ref)

    power, _ = render_pt_fast(cfg, scene, POS, QUAT, 16, KEY)
    unif, _ = render_pt_fast(
        dataclasses.replace(cfg, light_sampling="uniform"),
        scene, POS, QUAT, 16, KEY)
    power, unif = np.asarray(power), np.asarray(unif)
    # both unbiased
    assert abs(power.mean() - ref.mean()) / ref.mean() < 0.05
    assert abs(unif.mean() - ref.mean()) / ref.mean() < 0.05
    # spending NEE samples on the 94%-power light cuts the error hard
    mse_p = ((power - ref) ** 2).mean()
    mse_u = ((unif - ref) ** 2).mean()
    assert mse_p < 0.7 * mse_u, (mse_u, mse_p)


def test_single_light_power_equals_uniform():
    """One light: pick = 1 and the two modes agree to float tolerance
    (Cornell configs are unaffected by the new default)."""
    scene = cornell_box()
    cfg = PTConfig(width=24, height=24, max_bounces=3, rng="pcg")
    a, _ = render_pt_fast(cfg, scene, jnp.array([0.0, 0.2, 0.0]), QUAT,
                          8, KEY)
    b, _ = render_pt_fast(dataclasses.replace(cfg, light_sampling="uniform"),
                          scene, jnp.array([0.0, 0.2, 0.0]), QUAT, 8, KEY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_power_integrator_matches_wavefront():
    scene = two_light_scene()
    cfg = PTConfig(width=32, height=24, max_bounces=2)
    a, _ = render_pt(cfg, scene, POS, QUAT, 16, KEY)
    b, _ = render_pt_fast(cfg, scene, POS, QUAT, 16, KEY)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() < 6e-3
    assert abs(a.mean() - b.mean()) < 1e-4

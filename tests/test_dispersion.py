"""Spectral dispersion: energy exactness, chromatic split, gating."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.pathtracer import PTConfig, render_pt_fast
from raytracing_engine_tpu.pathtracer.integrator import render_pt
from raytracing_engine_tpu.pathtracer.scene import (
    DIELECTRIC,
    DIFFUSE,
    build_pt_scene,
)

KEY = jax.random.PRNGKey(13)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])
POS = jnp.zeros(3)


def glass_ball(dispersion, env=(1.0, 1.0, 1.0)):
    return build_pt_scene(
        spheres=[((0.0, 5.0, 0.0), 1.2, 0)],
        materials=[{"kind": DIELECTRIC, "ior": 1.5,
                    "dispersion": dispersion}],
        env=env)


def test_dispersive_furnace_energy():
    """One-hot x3 channel selection is unbiased: a dispersive clear ball
    in a uniform field still averages to Le (3x chroma noise on glass
    paths -> mean over the ball patch, generous spp)."""
    scene = build_pt_scene(
        spheres=[((0.0, 4.0, 0.0), 1.0, 0), ((0.0, 0.0, 0.0), 100.0, 1)],
        materials=[{"kind": DIELECTRIC, "ior": 1.5, "dispersion": 0.1},
                   {"albedo": (0,) * 3, "emission": (1.0,) * 3,
                    "kind": DIFFUSE}])
    cfg = PTConfig(width=48, height=32, max_bounces=8)
    img, _ = render_pt(cfg, scene, POS, QUAT, 256, KEY)
    img = np.asarray(img)
    h, w, _ = img.shape
    patch = img[h // 2 - 4: h // 2 + 4, w // 2 - 4: w // 2 + 4]
    assert abs(patch.mean() - 1.0) < 0.03, patch.mean()
    # corners see the enclosure directly: exactly Le, no chroma noise
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-4)


def test_dispersion_splits_channels():
    """Against a vertical-gradient sky, refraction through the ball
    samples different sky positions per channel: the per-pixel |R - B|
    inside the ball grows with dispersion (and stays ~0 without it,
    since the sky itself is achromatic)."""
    env = ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))  # gray gradient
    cfg = PTConfig(width=48, height=32, max_bounces=6)
    flat, _ = render_pt(cfg, glass_ball(0.0, env), POS, QUAT, 512, KEY)
    disp, _ = render_pt(cfg, glass_ball(0.25, env), POS, QUAT, 512, KEY)
    flat, disp = np.asarray(flat), np.asarray(disp)
    h, w, _ = flat.shape
    ball = np.s_[h // 2 - 5: h // 2 + 5, w // 2 - 5: w // 2 + 5]
    rb_flat = np.abs(flat[ball][..., 0] - flat[ball][..., 2]).mean()
    rb_disp = np.abs(disp[ball][..., 0] - disp[ball][..., 2]).mean()
    assert rb_disp > 3.0 * rb_flat + 0.005, (rb_flat, rb_disp)


def test_dispersion_zero_is_bitexact():
    """dispersion=0 on every material leaves mat_dispersion=None and the
    program identical to pre-dispersion."""
    a_scene = glass_ball(0.0)
    assert not a_scene.has_dispersion and a_scene.mat_dispersion is None
    cfg = PTConfig(width=16, height=12, max_bounces=3)
    a, _ = render_pt(cfg, a_scene, POS, QUAT, 4, KEY)
    b, _ = render_pt(cfg, glass_ball(0.0), POS, QUAT, 4, KEY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dispersion_wavefront_matches_reference():
    cfg = PTConfig(width=32, height=24, max_bounces=5)
    scene = glass_ball(0.2, env=((0.1, 0.2, 0.4), (1.0, 0.9, 0.7)))
    a, _ = render_pt(cfg, scene, POS, QUAT, 32, KEY)
    b, _ = render_pt_fast(cfg, scene, POS, QUAT, 32, KEY)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() < 6e-3
    assert abs(a.mean() - b.mean()) < 1e-4

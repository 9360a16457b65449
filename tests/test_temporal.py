"""Temporal reprojection accumulation: static-mean, orbit gain, resets."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.ops.quaternion import quat_from_rotation_z
from raytracing_engine_tpu.pathtracer import (
    PTConfig,
    render_aovs,
    render_pt_fast,
)
from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene
from raytracing_engine_tpu.pathtracer.temporal import (
    temporal_init,
    temporal_step,
)

QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])
POS = jnp.zeros(3)


def scene():
    mats = [
        {"albedo": (0.7, 0.5, 0.3), "kind": DIFFUSE},
        {"albedo": (0.4, 0.5, 0.7), "kind": DIFFUSE},
    ]
    # a ground sphere keeps most pixels ON geometry (history-capable);
    # silhouette/disoccluded pixels legitimately stay single-frame
    return build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 1.2, 0), ((2.0, 8.0, -0.5), 1.0, 1),
                 ((0.0, 8.0, -101.0), 100.0, 0)],
        materials=mats, env=(0.8, 0.9, 1.0))


def _frame(cfg, sc, pos, quat, key):
    img, _ = render_pt_fast(cfg, sc, pos, quat, 2, key)
    aovs = render_aovs(cfg, sc, pos, quat, 2, key)
    return img, aovs


def test_static_camera_accumulates_running_mean():
    cfg = PTConfig(width=48, height=32, max_bounces=2, rng="pcg")
    sc = scene()
    st = temporal_init(cfg)
    frames = []
    for k in range(6):
        img, aovs = _frame(cfg, sc, POS, QUAT, jax.random.PRNGKey(k))
        frames.append(np.asarray(img))
        st, out = temporal_step(cfg, st, img, aovs, POS, QUAT)
    mean = np.mean(frames, axis=0)
    # on pixels whose history survived every frame, the blend weights
    # 1/(n+1) make the output EXACTLY the running mean; silhouette pixels
    # legitimately fail the depth/normal validity and stay single-frame
    dep = np.asarray(aovs["depth"])
    L = np.asarray(st.length)
    m = dep > 0
    full = m & (L == 6.0)
    assert full.sum() > 0.5 * m.sum(), (full.sum(), m.sum())
    assert np.abs(np.asarray(out) - mean)[full].max() < 1e-5


def test_orbit_beats_single_frame():
    """Small per-frame camera rotations: accumulated history cuts error
    vs the last single frame alone (same total pose)."""
    cfg = PTConfig(width=48, height=32, max_bounces=2, rng="pcg")
    sc = scene()
    poses = [(POS, np.asarray(quat_from_rotation_z(0.01 * k), np.float32))
             for k in range(8)]
    ref, _ = render_pt_fast(cfg, sc, *map(jnp.asarray, poses[-1]), 512,
                            jax.random.PRNGKey(99))
    ref = np.asarray(ref)

    st = temporal_init(cfg)
    for k, (p, q) in enumerate(poses):
        img, aovs = _frame(cfg, sc, jnp.asarray(p), jnp.asarray(q),
                           jax.random.PRNGKey(k))
        st, out = temporal_step(cfg, st, img, aovs, jnp.asarray(p),
                                jnp.asarray(q))
    single = np.asarray(img)
    acc = np.asarray(out)
    dep = np.asarray(aovs["depth"])
    L = np.asarray(st.length)
    m = dep > 0
    # history survived the motion on most surface pixels, and on those
    # the accumulated error drops well below the single frame's
    assert (L[m] >= 4).mean() > 0.6, (L[m] >= 4).mean()
    sel = m & (L >= 4)
    mse_single = ((single - ref) ** 2)[sel].mean()
    mse_acc = ((acc - ref) ** 2)[sel].mean()
    assert mse_acc < 0.55 * mse_single, (mse_single, mse_acc)
    # and the whole-image error never gets worse
    assert ((acc - ref) ** 2)[m].mean() <= ((single - ref) ** 2)[m].mean()


def test_teleport_resets_history():
    cfg = PTConfig(width=32, height=24, max_bounces=2, rng="pcg")
    sc = scene()
    st = temporal_init(cfg)
    img, aovs = _frame(cfg, sc, POS, QUAT, jax.random.PRNGKey(0))
    st, _ = temporal_step(cfg, st, img, aovs, POS, QUAT)
    # turn the camera 180 deg (scene is at +y, now looking -y): nothing
    # from the old view is in the new frustum, so the output equals the
    # fresh frame and no pixel CARRIES history — fresh hits (the giant
    # ground sphere's underside) restart at length 1, never more
    quat2 = jnp.asarray(quat_from_rotation_z(np.pi), jnp.float32)
    img2, aovs2 = _frame(cfg, sc, POS, quat2, jax.random.PRNGKey(1))
    st, out = temporal_step(cfg, st, img2, aovs2, POS, quat2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img2))
    assert float(st.length.max()) <= 1.0


def test_temporal_moments_and_noise():
    """Static camera: the temporal moments are exactly the sample moments
    of the per-frame demodulated log luminances, and temporal_noise
    shrinks ~1/sqrt(n); short-history pixels return 0 and denoise falls
    back to its local estimate there (fixed point check)."""
    from raytracing_engine_tpu.pathtracer import denoise, temporal_noise
    from raytracing_engine_tpu.pathtracer.denoise import demod_log_lum

    cfg = PTConfig(width=32, height=24, max_bounces=2, rng="pcg")
    sc = scene()
    st = temporal_init(cfg)
    lums = []
    for k in range(5):
        img, aovs = _frame(cfg, sc, POS, QUAT, jax.random.PRNGKey(k))
        lums.append(np.asarray(demod_log_lum(img, aovs["albedo"])))
        st, out = temporal_step(cfg, st, img, aovs, POS, QUAT)
    L = np.asarray(st.length)
    full = L == 5.0
    m1 = np.mean(lums, axis=0)
    m2 = np.mean([x * x for x in lums], axis=0)
    np.testing.assert_allclose(np.asarray(st.m1)[full], m1[full],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.m2)[full], m2[full],
                               rtol=1e-4, atol=1e-5)
    nz = np.asarray(temporal_noise(st))
    want_se = np.sqrt(np.maximum(m2 - m1 * m1, 0.0) / 5.0)
    # var = m2 - m1^2 is catastrophically cancellative in f32 when the
    # luminance is near-deterministic (var ~ 1e-6 under m2 ~ 1), so the
    # comparison carries an absolute floor; the estimate itself is used
    # only as a filter bandwidth, where that floor is immaterial
    np.testing.assert_allclose(nz[full], want_se[full], rtol=0.1,
                               atol=2e-3)
    # short-history pixels report 0 (denoise falls back there)
    assert (nz[L < 4] == 0.0).all()

    # denoise accepts the override; flat-region fixed point holds
    flat = jnp.full((16, 16, 3), 0.3)
    alb = jnp.full((16, 16, 3), 0.6)
    nrm = jnp.zeros((16, 16, 3)).at[..., 2].set(1.0)
    dep = jnp.full((16, 16), 5.0)
    ov = jnp.full((16, 16), 0.01)
    out = np.asarray(denoise(flat, alb, nrm, dep, iterations=2, noise=ov))
    np.testing.assert_allclose(out, 0.3, rtol=1e-5)

"""Pixel parity: vectorized jnp renderer vs the scalar golden reference.

The golden renderer (models/golden.py) implements the GLSL math per pixel in
numpy float32; the jnp pipeline must reproduce it pixelwise. Trajectory-level
semantics (algorithm-3 cache, termination, back-off) are identical by
construction, so tolerances only absorb float32 reassociation differences.
"""

import numpy as np
import jax.numpy as jnp

from raytracing_engine_tpu.models import conemarch, golden
from raytracing_engine_tpu.ops.march import cone_march, shadow_march


def _scene_arrays(scene):
    obj_mask = jnp.arange(scene.obj_pos.shape[0]) < scene.obj_count
    return scene.obj_pos, scene.obj_radius, obj_mask


def test_cone_march_matches_golden_scalar(small_cfg, scene, camera_pose):
    pos, quat = camera_pose
    sc = golden._scene_np(scene)
    rng = np.random.default_rng(42)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    threshold = small_cfg.level_threshold(0)

    expected = np.array(
        [
            golden.trace_cone(pos + d, d, threshold, sc, small_cfg.render_dist)
            for d in dirs
        ],
        np.float32,
    )

    obj_pos, obj_radius, obj_mask = _scene_arrays(scene)
    got = cone_march(
        jnp.asarray(pos + dirs),
        jnp.asarray(dirs),
        jnp.float32(threshold),
        obj_pos,
        obj_radius,
        obj_mask,
        small_cfg.render_dist,
        small_cfg.max_march_steps,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-3)


def test_shadow_march_matches_golden_scalar(small_cfg, scene):
    sc = golden._scene_np(scene)
    rng = np.random.default_rng(7)
    # shadow rays from points near the spheres toward the lights
    origins = rng.normal(size=(32, 3)).astype(np.float32) * 4.0
    light = np.array([-1.0, 0.0, -3.0], np.float32)

    to_light = light - origins
    dist = np.linalg.norm(to_light, axis=-1).astype(np.float32)
    dirs = (to_light / dist[:, None]).astype(np.float32)

    expected = np.array(
        [
            golden.shadow_ray(o + d, d, e, sc)
            for o, d, e in zip(origins + 0, dirs, dist)
        ],
        np.float32,
    )

    obj_pos, obj_radius, obj_mask = _scene_arrays(scene)
    got = shadow_march(
        jnp.asarray(origins + dirs),
        jnp.asarray(dirs),
        jnp.asarray(dist),
        obj_pos,
        obj_radius,
        obj_mask,
        small_cfg.max_shadow_steps,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-3)


def test_depth_pyramid_matches_golden(small_cfg, scene, camera_pose, golden_levels):
    pos, quat = camera_pose
    levels = conemarch.render_depth_pyramid(
        small_cfg, scene, jnp.asarray(pos), jnp.asarray(quat)
    )
    assert len(levels) == len(golden_levels)
    for i, (got, want) in enumerate(zip(levels, golden_levels)):
        assert got.shape == want.shape, f"level {i} shape"
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4, atol=1e-3, err_msg=f"level {i}"
        )


def test_full_image_matches_golden(small_cfg, scene, camera_pose, golden_image):
    pos, quat = camera_pose
    img = conemarch.render_jit(
        small_cfg, scene, jnp.asarray(pos), jnp.asarray(quat)
    )
    assert img.shape == (small_cfg.height, small_cfg.width, 3)
    np.testing.assert_allclose(
        np.asarray(img), golden_image, rtol=1e-3, atol=2e-3
    )


def test_image_has_content(golden_image):
    """The default scene from the origin must show lit spheres (not all black,
    not saturated)."""
    assert golden_image.max() > 0.05
    assert (golden_image == 0).mean() > 0.05  # some background

"""Vectorized jnp cone-march renderer — the reference-parity pipeline.

One jitted frame = N depth-pyramid passes (coarse → fine, each seeded from
the previous level — reference compute.glsl:70-87, pyramid sizing
src/main.rs:203-234) followed by the shading pass (fragment.glsl:127-187).
The level loop is unrolled at trace time (level count and shapes are static,
from RenderConfig), which is the XLA analog of the reference's per-level
dispatch loop in get_command_buffer (src/main.rs:300-316).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raytracing_engine_tpu.config import RenderConfig
from raytracing_engine_tpu.ops.march import cone_march
from raytracing_engine_tpu.ops.raygen import pixel_norm_coords, ray_directions
from raytracing_engine_tpu.ops.shade import phong_shade


def render_depth_level(
    cfg: RenderConfig,
    level: int,
    scene,
    cam_pos,
    cam_quat,
    prev_depth,  # FULL previous level (prev_h, prev_w), or None at level 0
    row0=0,       # first global row of the band (traced ok)
    band_h=None,  # band height (static); None = full level
):
    """One depth-pyramid level — compute.glsl main() (:70-87).

    With row0/band_h this renders a horizontal band of the level (used by
    tile-sharded rendering — each device owns a band; prev_depth must still
    be the full parent level, which tile sharding all-gathers between levels).
    """
    w, h = cfg.level_dims[level]
    if band_h is None:
        band_h = h
    image_size = jnp.array(cfg.level_image_size(level), jnp.float32)
    ratio = jnp.array(cfg.ratio, jnp.float32)
    threshold = jnp.float32(cfg.level_threshold(level))

    nc = pixel_norm_coords(w, band_h, image_size, ratio, row0=row0)
    direction = ray_directions(nc, cam_quat)  # (band_h, w, 3)

    if prev_depth is None:
        seed = jnp.ones((band_h, w), jnp.float32)  # near plane — compute.glsl:79
    else:
        # seed from the parent pixel: imgs[iter-1][id/2] — compute.glsl:81
        ph, pw = prev_depth.shape
        rows = (jnp.arange(band_h) + row0) // 2
        cols = jnp.arange(w) // 2
        assert (h - 1) // 2 < ph and (w - 1) // 2 < pw, "pyramid sizing invariant"
        seed = prev_depth[rows][:, cols]

    obj_mask = jnp.arange(scene.obj_pos.shape[0]) < scene.obj_count
    origin = cam_pos + direction * seed[..., None]
    marched = cone_march(
        origin,
        direction,
        threshold,
        scene.obj_pos,
        scene.obj_radius,
        obj_mask,
        cfg.render_dist,
        cfg.max_march_steps,
    )
    return jnp.maximum(seed + marched, 0.0)  # compute.glsl:86


def render_depth_pyramid(cfg: RenderConfig, scene, cam_pos, cam_quat):
    """All levels, coarse → fine. Returns a tuple of (h, w) arrays."""
    levels = []
    prev = None
    for i in range(cfg.level_count):
        prev = render_depth_level(cfg, i, scene, cam_pos, cam_quat, prev)
        levels.append(prev)
    return tuple(levels)


def render(cfg: RenderConfig, scene, cam_pos, cam_quat):
    """Full frame: depth pyramid + Phong shading → (H, W, 3) float32.

    The finest level equals the output resolution when width/height are
    multiples of 8 (RenderConfig enforces this), so no crop is needed — the
    fragment pass reads the finest level directly (reference src/main.rs:652).
    """
    depth = render_depth_pyramid(cfg, scene, cam_pos, cam_quat)[-1]
    image_size = jnp.array(cfg.level_image_size(cfg.level_count - 1), jnp.float32)
    ratio = jnp.array(cfg.ratio, jnp.float32)
    nc = pixel_norm_coords(cfg.width, cfg.height, image_size, ratio)
    direction = ray_directions(nc, cam_quat)
    return phong_shade(
        depth, direction, cam_pos, scene, cfg.render_dist, cfg.max_shadow_steps
    )


@partial(jax.jit, static_argnums=0)
def render_jit(cfg: RenderConfig, scene, cam_pos, cam_quat):
    return render(cfg, scene, cam_pos, cam_quat)

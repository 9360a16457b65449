"""Fused finest-depth + shade kernel.

The finest pyramid level and the shading pass share the same tile, the same
ray directions, and the same scene tables; running them as separate kernels
costs a launch, a full-resolution depth round trip through HBM, and a
duplicate ray-gen. This kernel marches the finest level from its seed and
shades in-register — bitwise-identical output to the two-kernel pipeline
(enforced by test), ~0.4 ms faster at 1080p.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_engine_tpu.config import MAX_LIGHTS, MAX_OBJECTS, RenderConfig
from raytracing_engine_tpu.ops.pallas.common import (
    pick_tile,
    ray_dir_planes,
    tile_pixel_planes,
)
from raytracing_engine_tpu.ops.pallas.depth import _march_tile
from raytracing_engine_tpu.ops.pallas.shade import shade_tile_planes


def _fused_kernel(params_ref, count_ref, obj_ref, mat_ref, light_ref,
                  seed_ref, out_ref, *, tile_h, tile_w, render_dist,
                  max_march_steps, max_shadow_steps,
                  n_obj=MAX_OBJECTS, n_light=MAX_LIGHTS, masked=True):
    cam_x, cam_y, cam_z = params_ref[0], params_ref[1], params_ref[2]
    qx, qy, qz, qw = (params_ref[3], params_ref[4], params_ref[5], params_ref[6])
    img_sx, img_sy = params_ref[7], params_ref[8]
    ratio_x, ratio_y = params_ref[9], params_ref[10]
    threshold = params_ref[11]
    obj_count = count_ref[0]
    light_count = count_ref[1]

    i = pl.program_id(0)
    j = pl.program_id(1)
    rows, cols = tile_pixel_planes(
        (i * tile_h).astype(jnp.float32), (j * tile_w).astype(jnp.float32),
        tile_h, tile_w,
    )
    ncx = ((cols * 2.0 + 1.0) * img_sx - 1.0) * ratio_x
    ncy = ((rows * 2.0 + 1.0) * img_sy - 1.0) * ratio_y
    dx, dy, dz = ray_dir_planes(ncx, ncy, qx, qy, qz, qw)

    # finest-level cone march — compute.glsl main()
    seed = seed_ref[:]
    ox = cam_x + dx * seed
    oy = cam_y + dy * seed
    oz = cam_z + dz * seed
    length = _march_tile(
        ox, oy, oz, dx, dy, dz, threshold, obj_ref, obj_count,
        render_dist, max_march_steps, n_obj, masked,
    )
    depth = jnp.maximum(seed + length, 0.0)

    # shading — fragment.glsl main(), in-register depth
    r, g, b = shade_tile_planes(
        dx, dy, dz, depth, cam_x, cam_y, cam_z,
        obj_ref, mat_ref, light_ref, obj_count, light_count,
        render_dist, max_shadow_steps, n_obj, n_light, masked,
    )
    out_ref[0] = r
    out_ref[1] = g
    out_ref[2] = b


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "n_obj", "n_light")
)
def depth_shade_fused(cfg: RenderConfig, scene, cam_pos, cam_quat, seed,
                      interpret=None, n_obj=None, n_light=None):
    """March the finest level from `seed` and shade: (H, W, 3) float32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = cfg.height, cfg.width
    tile_h, tile_w = pick_tile(h, w, cfg.tile_h, cfg.tile_w)
    level = cfg.level_count - 1

    img_s = cfg.level_image_size(level)
    params = jnp.concatenate([
        jnp.asarray(cam_pos, jnp.float32),
        jnp.asarray(cam_quat, jnp.float32),
        jnp.array([img_s[0], img_s[1], cfg.ratio[0], cfg.ratio[1],
                   cfg.level_threshold(level)], jnp.float32),
    ])
    counts = jnp.stack([scene.obj_count, scene.light_count])
    obj = jnp.concatenate(
        [scene.obj_pos, scene.obj_radius[:, None]], axis=1
    ).astype(jnp.float32)
    mat = jnp.concatenate(
        [
            scene.mat_color,
            scene.mat_diffuse[:, None],
            scene.mat_specular[:, None],
            scene.mat_shine[:, None],
            scene.mat_ambient[:, None],
            jnp.zeros((scene.mat_color.shape[0], 1), jnp.float32),
        ],
        axis=1,
    )
    zero = jnp.zeros((scene.light_pos.shape[0], 1), jnp.float32)
    light = jnp.concatenate(
        [scene.light_pos, zero, scene.light_color, zero], axis=1
    )

    static = n_obj is not None and n_light is not None
    kernel = functools.partial(
        _fused_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        render_dist=cfg.render_dist,
        max_march_steps=cfg.max_march_steps,
        max_shadow_steps=cfg.max_shadow_steps,
        n_obj=n_obj if static else MAX_OBJECTS,
        n_light=n_light if static else MAX_LIGHTS,
        masked=not static,
    )
    grid = (h // tile_h, w // tile_w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # objects
            pl.BlockSpec(memory_space=pltpu.SMEM),  # materials
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),  # finest seed
        ],
        out_specs=pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, counts, obj, mat, light, seed)
    return jnp.moveaxis(out, 0, -1)

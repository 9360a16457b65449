"""Pallas depth kernel — one pyramid level of algorithm-3 cone marching.

TPU-native re-design of reference shaders/compute.glsl:34-87:

- grid over (tile_h, tile_w) image tiles; each tile's march ``while_loop``
  runs **in-kernel** until that tile's rays converge — unlike the whole-image
  XLA while-loop (models/conemarch.py), a tile above empty sky exits in a few
  iterations instead of being dragged along to the worst pixel of the frame.
- ray state is component planes (f32 (tile_h, tile_w)); the <= MAX_OBJECTS
  spheres are unrolled at compile time with scalar centers read from SMEM —
  the lazy algorithm-3 cache becomes per-object bound planes + selects.
- the coarse-to-fine seed (compute.glsl:79-82) arrives as a pre-upsampled
  full-res seed image (the 2x-nearest upsample is a cheap XLA gather between
  pallas calls), so the kernel is uniform across levels.

The marched trajectories are identical to the golden/jnp paths, so parity
tests compare pixelwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_engine_tpu.config import MAX_OBJECTS, RenderConfig
from raytracing_engine_tpu.ops.pallas.common import (
    pick_tile,
    ray_dir_planes,
    tile_pixel_planes,
    unrolled_sdf_caches,
)


def _march_tile(ox, oy, oz, dx, dy, dz, threshold, obj_ref, obj_count,
                render_dist, max_steps, n_obj=MAX_OBJECTS, masked=True):
    """Algorithm-3 cone march on one tile; returns the marched-length plane.
    n_obj/masked: static-object-count specialization (see depth_level_pallas)."""
    big = jnp.float32(render_dist)

    cache0 = unrolled_sdf_caches(ox, oy, oz, obj_ref, obj_count, big,
                                 n_obj, masked)
    zeros = jnp.zeros_like(ox)
    # `done` is carried as an f32 0/1 plane — Mosaic cannot legalize i1
    # vectors in while-loop carries
    state0 = (zeros, zeros, zeros, jnp.int32(0), tuple(cache0))

    def cond(state):
        length, last, done, it, cache = state
        return (it < max_steps) & jnp.any((done == 0.0) & (length < big))

    def body(state):
        length, last, done, it, cache = state
        active = (done == 0.0) & (length < big)

        px = ox + dx * length
        py = oy + dy * length
        pz = oz + dz * length
        radius = (length + 1.0) * threshold

        dist = big
        new_cache = []
        for k in range(n_obj):
            bound = cache[k] - last
            # re-evaluate the true SDF only where the 1-Lipschitz lower
            # bound dips to the cone radius — compute.glsl:51-57
            cx, cy, cz, cr = obj_ref[k, 0], obj_ref[k, 1], obj_ref[k, 2], obj_ref[k, 3]
            ddx = px - cx
            ddy = py - cy
            ddz = pz - cz
            fresh = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz) - cr
            upd = jnp.where(bound <= radius, fresh, bound)
            if masked:
                upd = jnp.where(k < obj_count, upd, big)
            new_cache.append(upd)
            dist = jnp.minimum(dist, upd)

        new_last = jnp.maximum(dist, 0.0)
        new_length = length + new_last
        hit = dist <= radius
        new_length = jnp.where(hit, new_length - radius, new_length)

        length = jnp.where(active, new_length, length)
        last = jnp.where(active, new_last, last)
        cache = tuple(
            jnp.where(active, nc, oc) for nc, oc in zip(new_cache, cache)
        )
        done = jnp.where(active & hit, 1.0, done)
        return (length, last, done, it + 1, cache)

    length, _, _, _, _ = jax.lax.while_loop(cond, body, state0)
    return length


def _depth_kernel(params_ref, count_ref, obj_ref, seed_ref, out_ref,
                  *, tile_h, tile_w, render_dist, max_steps,
                  n_obj=MAX_OBJECTS, masked=True):
    px_cam = params_ref[0]
    py_cam = params_ref[1]
    pz_cam = params_ref[2]
    qx, qy, qz, qw = (params_ref[3], params_ref[4], params_ref[5], params_ref[6])
    img_sx, img_sy = params_ref[7], params_ref[8]
    ratio_x, ratio_y = params_ref[9], params_ref[10]
    threshold = params_ref[11]
    obj_count = count_ref[0]

    i = pl.program_id(0)
    j = pl.program_id(1)
    rows, cols = tile_pixel_planes(
        (i * tile_h).astype(jnp.float32), (j * tile_w).astype(jnp.float32),
        tile_h, tile_w,
    )

    # normCoord = ((id*2+1)*imageSize - 1) * ratio — compute.glsl:71-72
    ncx = ((cols * 2.0 + 1.0) * img_sx - 1.0) * ratio_x
    ncy = ((rows * 2.0 + 1.0) * img_sy - 1.0) * ratio_y
    dx, dy, dz = ray_dir_planes(ncx, ncy, qx, qy, qz, qw)

    seed = seed_ref[:]
    ox = px_cam + dx * seed
    oy = py_cam + dy * seed
    oz = pz_cam + dz * seed

    length = _march_tile(
        ox, oy, oz, dx, dy, dz, threshold, obj_ref, obj_count,
        render_dist, max_steps, n_obj, masked,
    )
    out_ref[:] = jnp.maximum(seed + length, 0.0)  # compute.glsl:86


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "level", "interpret", "n_obj"),
)
def depth_level_pallas(cfg: RenderConfig, level: int, scene, cam_pos, cam_quat,
                       seed, interpret=None, n_obj=None):
    """One depth level. seed: (h, w) full-res seed depths (ones at level 0,
    else the 2x-nearest upsample of the previous level). Returns (h, w).

    n_obj: STATIC object count — when the caller knows the live count
    (host-side scenes always do), the kernel unrolls exactly that many
    spheres with no dead-slot masking; None keeps the generic masked kernel.
    """
    if interpret is None:
        interpret = _interpret_default()
    w, h = cfg.level_dims[level]
    tile_h, tile_w = pick_tile(h, w, cfg.tile_h, cfg.tile_w)

    img_s = cfg.level_image_size(level)
    params = jnp.concatenate([
        jnp.asarray(cam_pos, jnp.float32),
        jnp.asarray(cam_quat, jnp.float32),
        jnp.array([img_s[0], img_s[1], cfg.ratio[0], cfg.ratio[1],
                   cfg.level_threshold(level)], jnp.float32),
    ])
    counts = scene.obj_count.reshape(1)
    obj = jnp.concatenate(
        [scene.obj_pos, scene.obj_radius[:, None]], axis=1
    ).astype(jnp.float32)  # (MAX_OBJECTS, 4)

    kernel = functools.partial(
        _depth_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        render_dist=cfg.render_dist,
        max_steps=cfg.max_march_steps,
        n_obj=MAX_OBJECTS if n_obj is None else n_obj,
        masked=n_obj is None,
    )
    grid = (h // tile_h, w // tile_w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # obj table
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),  # seed
        ],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, counts, obj, seed)


def upsample_seed(prev_depth, h: int, w: int):
    """Nearest 2x upsample: seed[y, x] = prev[y//2, x//2] — compute.glsl:81."""
    rows = jnp.arange(h) // 2
    cols = jnp.arange(w) // 2
    return prev_depth[rows][:, cols]

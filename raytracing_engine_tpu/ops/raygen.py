"""Camera ray generation.

Coordinate convention (reference src/main.rs:350-357): Z-up, Y-forward,
X-right. A pixel's normalized coordinate nc maps to the unnormalized camera-
space direction (nc.x, 1, nc.y), rotated by the camera quaternion and
normalized (reference compute.glsl:70-77, fragment.glsl:129-133).

The pyramid's per-level mapping (reference compute.glsl:71-72):
    normCoord = ((id*2 + 1) * imageSize - 1) * ratio
where ``imageSize`` is the reciprocal of the level's effective resolution in
window pixels and ``ratio = [FOV, FOV*h/w]``. Vulkan's gl_FragCoord has y
increasing downward; with Z-up this puts image row 0 at +z after the
(nc.x, 1, nc.y) embedding — we reproduce it as-is and flip only at PNG time.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_engine_tpu.ops.quaternion import quat_rotate


def pixel_norm_coords(level_w, level_h, image_size, ratio, row0=0, dtype=jnp.float32):
    """Normalized coords for pixels of one pyramid level (or a row band of it).

    level_w/level_h: ints (static) — band width/height; image_size: (2,)
    per-level pixel pitch (reference push constant ``imageSize``); ratio: (2,)
    FOV multiplier; row0: first global row of the band (traced ok) — used by
    tile-sharded rendering where each device owns a horizontal band.
    Returns (level_h, level_w, 2) — [..., 0] is x, [..., 1] is y; row-major
    image layout (y is the leading axis, matching gl_GlobalInvocationID.y).
    """
    ix = jnp.arange(level_w, dtype=dtype)
    iy = jnp.arange(level_h, dtype=dtype) + row0
    ncx = (ix * 2.0 + 1.0) * image_size[0] - 1.0
    ncy = (iy * 2.0 + 1.0) * image_size[1] - 1.0
    ncx = ncx * ratio[0]
    ncy = ncy * ratio[1]
    gx = jnp.broadcast_to(ncx[None, :], (level_h, level_w))
    gy = jnp.broadcast_to(ncy[:, None], (level_h, level_w))
    return jnp.stack([gx, gy], axis=-1)


def ray_directions(norm_coords, rot_quat):
    """Unit ray directions for normalized coords.

    norm_coords: (..., 2); rot_quat: (4,).
    dir = normalize(rotate(rot, (nc.x, 1, nc.y))) — reference compute.glsl:77.
    """
    ncx = norm_coords[..., 0]
    ncy = norm_coords[..., 1]
    v = jnp.stack([ncx, jnp.ones_like(ncx), ncy], axis=-1)
    v = quat_rotate(rot_quat, v)
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))

"""Shared plane-math helpers for the Pallas kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_engine_tpu.config import MAX_OBJECTS


def pick_tile(h: int, w: int, max_th: int = 16, max_tw: int = 256):
    """Tile dims that divide (h, w) under Mosaic's block constraints: the
    last block dim must be a multiple of 128 (or the full width), the
    second-to-last a multiple of 8 (or the full height).

    Smaller tiles converge independently sooner (fewer wasted march steps
    per tile); larger tiles amortize loop/grid overhead. The caps live in
    RenderConfig (tile_h/tile_w) so they are part of the jit cache key.
    """
    tw = next((t for t in (max_tw, 256, 128) if t <= max_tw and w % t == 0), w)
    th = next((t for t in (max_th, 16, 8) if t <= max_th and h % t == 0), h)
    return min(th, h), min(tw, w)


def tile_pixel_planes(row0, col0, th: int, tw: int):
    """(rows, cols) f32 planes of global pixel indices for this tile.
    Mosaic only lowers integer iota; cast to f32 after."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + col0
    return rows, cols


def rotate_planes(qx, qy, qz, qw, vx, vy, vz):
    """Quaternion rotate with scalar q and plane v — utilities.glsl:26-29.

    t = cross(q.xyz, v) + q.w*v;  r = v + 2*cross(q.xyz, t)
    """
    tx = qy * vz - qz * vy + qw * vx
    ty = qz * vx - qx * vz + qw * vy
    tz = qx * vy - qy * vx + qw * vz
    rx = vx + 2.0 * (qy * tz - qz * ty)
    ry = vy + 2.0 * (qz * tx - qx * tz)
    rz = vz + 2.0 * (qx * ty - qy * tx)
    return rx, ry, rz


def ray_dir_planes(ncx, ncy, qx, qy, qz, qw):
    """normalize(rotate(q, (ncx, 1, ncy))) — compute.glsl:77 as planes."""
    vx, vy, vz = ncx, jnp.ones_like(ncx), ncy
    dx, dy, dz = rotate_planes(qx, qy, qz, qw, vx, vy, vz)
    inv = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx / inv, dy / inv, dz / inv


def sphere_sdf_plane(px, py, pz, cx, cy, cz, radius):
    """sphereSDF as planes with scalar center/radius — utilities.glsl:36-38."""
    dx = px - cx
    dy = py - cy
    dz = pz - cz
    return jnp.sqrt(dx * dx + dy * dy + dz * dz) - radius


def unrolled_sdf_caches(px, py, pz, obj_ref, obj_count, big,
                        n_obj: int = MAX_OBJECTS, masked: bool = True):
    """SDFs of the first n_obj slots at plane position p, dead slots = big.

    obj_ref: SMEM (MAX_OBJECTS, 4) — [cx, cy, cz, radius] per row.
    With a static object count (masked=False), dead-slot selects vanish.
    Returns a list of n_obj planes.
    """
    out = []
    for k in range(n_obj):
        d = sphere_sdf_plane(
            px, py, pz, obj_ref[k, 0], obj_ref[k, 1], obj_ref[k, 2], obj_ref[k, 3]
        )
        out.append(jnp.where(k < obj_count, d, big) if masked else d)
    return out

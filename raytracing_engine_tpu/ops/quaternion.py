"""Quaternion math, [x, y, z, w] layout (glam / GLSL vec4 convention).

The reference rotates ray directions with a quaternion passed as a push
constant: ``rotate(q, v) = v + 2*cross(q.xyz, cross(q.xyz, v) + q.w*v)``
(reference shaders/utilities.glsl:26-29), and builds the camera quaternion as
``Quat::from_rotation_z(-yaw) * Quat::from_rotation_x(pitch)``
(reference src/main.rs:402-404).

All functions are batched over leading axes of ``v`` and work under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_from_rotation_x(angle):
    """glam Quat::from_rotation_x: rotation of `angle` radians about +X."""
    half = 0.5 * angle
    s, c = jnp.sin(half), jnp.cos(half)
    z = jnp.zeros_like(s)
    return jnp.stack([s, z, z, c], axis=-1)


def quat_from_rotation_z(angle):
    """glam Quat::from_rotation_z: rotation of `angle` radians about +Z."""
    half = 0.5 * angle
    s, c = jnp.sin(half), jnp.cos(half)
    z = jnp.zeros_like(s)
    return jnp.stack([z, z, s, c], axis=-1)


def quat_mul(a, b):
    """Hamilton product a*b ([x,y,z,w] layout): apply b first, then a."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion q.

    Exactly the reference's ``rotate`` (shaders/utilities.glsl:26-29):
        t = cross(q.xyz, v) + q.w * v
        return v + 2 * cross(q.xyz, t)

    q: (..., 4), v: (..., 3); broadcasting over leading axes.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = jnp.cross(qv, v) + qw * v
    return v + 2.0 * jnp.cross(qv, t)

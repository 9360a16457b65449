"""Primitive intersection ops (SoA, batched over rays).

All functions take ray batches origin/direction (..., 3) and SoA primitive
arrays, returning hit distances with ``inf`` for misses. Static shapes, no
data-dependent branching — XLA-friendly brute force; BVH traversal
(accel/bvh.py) culls the candidate set for big meshes.
"""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(jnp.inf)
EPS = jnp.float32(1e-6)


def ray_sphere(origin, direction, center, radius, t_min=1e-3):
    """Batched ray-sphere. origin/direction (..., 3); center (K, 3),
    radius (K,). Returns t (..., K), inf on miss.

    Solves |o + t d - c|^2 = r^2 with unit d: t^2 + 2 b t + c0 = 0.
    """
    oc = origin[..., None, :] - center  # (..., K, 3)
    b = jnp.sum(oc * direction[..., None, :], axis=-1)  # (..., K)
    c0 = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_min, t0, t1)  # prefer near root; allow inside hits
    return jnp.where((disc > 0.0) & (t > t_min), t, INF)


def ray_triangle(origin, direction, v0, e1, e2, t_min=1e-3):
    """Batched Möller–Trumbore. origin/direction (..., 3); v0/e1/e2 (T, 3)
    (e1 = v1 - v0, e2 = v2 - v0). Returns (t, u, v) each (..., T); t=inf on
    miss. Watertight enough for rendering; no backface culling (matches
    two-sided shading)."""
    d = direction[..., None, :]                    # (..., 1, 3)
    pvec = jnp.cross(d, e2)                        # (..., T, 3)
    det = jnp.sum(e1 * pvec, axis=-1)              # (..., T)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < EPS, 1.0, det)

    tvec = origin[..., None, :] - v0               # (..., T, 3)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)                     # (..., T, 3)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det

    valid = (
        (jnp.abs(det) >= EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(valid, t, INF), u, v


def ray_aabb(origin, inv_dir, box_min, box_max, t_max):
    """Slab test. origin/inv_dir (..., 3); box_min/box_max (..., 3) or (K, 3).
    Returns bool hit (...,) or (..., K) and entry t. inv_dir = 1/direction
    (inf components fine)."""
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.max(tn, axis=-1)
    t_far = jnp.min(tf, axis=-1)
    hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_max)
    return hit, t_near

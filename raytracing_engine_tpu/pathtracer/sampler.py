"""Monte-Carlo sampling: hemisphere + light sampling for NEE.

All samplers take uniform-[0,1) planes and return component-plane vectors
(ops/vec3.py). RNG is jax.random (threefry) keyed per (pass, bounce, use) —
one key draws an iid plane for the whole image.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_engine_tpu.ops import vec3 as v3

_PI = float(jnp.pi)


def build_onb(n):
    """Branchless orthonormal basis around unit normal n (Duff et al. 2017)."""
    nx, ny, nz = n
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    s = (b, sign + ny * ny * a, -ny)
    return t, s


def cosine_hemisphere(u1, u2, normal):
    """Cosine-weighted direction about `normal`; pdf = cos/π.
    Returns (dir V3, pdf plane)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * _PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    t, s = build_onb(normal)
    d = v3.add(v3.add(v3.scale(t, x), v3.scale(s, y)), v3.scale(normal, z))
    return d, z / _PI


def reflect(d, n):
    """Mirror reflection of incoming direction d about normal n."""
    return v3.sub(d, v3.scale(n, 2.0 * v3.dot(d, n)))


def sample_sphere_area(u1, u2, center, radius):
    """Uniform point on the full sphere surface. center: V3 planes or (3,);
    returns (point V3, normal V3); pdf_area = 1/(4πr²) handled by caller."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * _PI * u2
    n = (r * jnp.cos(phi), r * jnp.sin(phi), z)
    p = v3.add(center, v3.scale(n, radius))
    return p, n


def sample_triangle_area(u1, u2, p0, e1, e2):
    """Uniform point on a triangle (sqrt warp); normal = normalize(e1×e2).
    p0/e1/e2: V3 planes; pdf_area = 1/area handled by caller."""
    su = jnp.sqrt(u1)
    b1 = su * (1.0 - u2)
    b2 = su * u2
    p = v3.add(p0, v3.add(v3.scale(e1, b1), v3.scale(e2, b2)))
    n, _ = v3.normalize(v3.cross(e1, e2))
    return p, n


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (β=2): w_a = pdf_a² / (pdf_a² + pdf_b²)."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-24)

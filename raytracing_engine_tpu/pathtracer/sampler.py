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


# ---------------------------------------------------------------------------
# GGX microfacet (rough conductor) — kernel-safe (sqrt/sin/cos/select only)
# ---------------------------------------------------------------------------

def ggx_d(cos_h, alpha):
    """GGX/Trowbridge-Reitz NDF D(h) for unit half-vector cosine cos_h
    (against the shading normal). alpha = roughness² (Disney remap)."""
    a2 = alpha * alpha
    c2 = cos_h * cos_h
    denom = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(_PI * denom * denom, 1e-12)


def ggx_smith_g1(cos_v, alpha):
    """Smith height-correlated-separable masking term G1 for one
    direction (cosine against the shading normal)."""
    a2 = alpha * alpha
    c = jnp.maximum(cos_v, 1e-6)
    return 2.0 * c / jnp.maximum(
        c + jnp.sqrt(a2 + (1.0 - a2) * c * c), 1e-12)


def sample_ggx_h(u1, u2, normal, alpha):
    """Sample a half-vector from the GGX NDF about `normal`
    (pdf_h = D(h)·cos_h). Returns (h V3, cos_h plane)."""
    a2 = alpha * alpha
    cos_h = jnp.sqrt(jnp.clip((1.0 - u1) / (1.0 + (a2 - 1.0) * u1),
                              0.0, 1.0))
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    phi = 2.0 * _PI * u2
    t, s = build_onb(normal)
    h = v3.add(
        v3.add(v3.scale(t, sin_h * jnp.cos(phi)),
               v3.scale(s, sin_h * jnp.sin(phi))),
        v3.scale(normal, cos_h))
    return h, cos_h


def ggx_d_aniso(hx, hy, hz, ax, ay):
    """Anisotropic GGX NDF in the tangent frame (hx along the tangent,
    hy along the bitangent, hz along the normal)."""
    e = (hx / ax) ** 2 + (hy / ay) ** 2 + hz * hz
    return 1.0 / jnp.maximum(_PI * ax * ay * e * e, 1e-12)


def ggx_smith_g1_aniso(vx, vy, vz, ax, ay):
    """Smith G1 for the anisotropic GGX (Heitz 2014 Λ form), tangent-frame
    direction components."""
    vz2 = jnp.maximum(vz * vz, 1e-12)
    lam = 0.5 * (jnp.sqrt(1.0 + (ax * ax * vx * vx + ay * ay * vy * vy)
                          / vz2) - 1.0)
    return jnp.where(vz > 1e-6, 1.0 / (1.0 + lam), 0.0)


def sample_ggx_h_aniso(u1, u2, t, s, n, ax, ay):
    """Sample an anisotropic-GGX half-vector about the (t, s, n) tangent
    frame via slope space: slopes (ax·r·cosφ, ay·r·sinφ) with
    r² = u1/(1-u1) follow the stretched P22, so pdf_h = D(h)·cos_h —
    the anisotropic generalization of sample_ggx_h. Returns h (V3, world)."""
    r = jnp.sqrt(jnp.clip(u1 / jnp.maximum(1.0 - u1, 1e-12), 0.0, 1e12))
    phi = 2.0 * _PI * u2
    sx = ax * r * jnp.cos(phi)
    sy = ay * r * jnp.sin(phi)
    inv = 1.0 / jnp.sqrt(1.0 + sx * sx + sy * sy)
    # h = normalize(sx·t + sy·s + n): P22 is even in the slopes, so the
    # positive sign is the same distribution AND reduces to sample_ggx_h's
    # exact sample values at ax == ay (hx = a·r·cosφ/√(1+a²r²) =
    # sinθ·cosφ with the iso cosθ = √((1-u1)/(1+(a²-1)u1)))
    h = v3.add(v3.add(v3.scale(t, sx * inv), v3.scale(s, sy * inv)),
               v3.scale(n, inv))
    return h


def ggx_eval_aniso(n, t, s, wo, wi, f0, ax, ay):
    """Anisotropic GGX conductor BRDF + the pdf of
    sample_ggx_h_aniso-driven reflection (D·cos_h / (4·(wo·h))). The
    tangent frame is build_onb(n) — a deterministic per-normal frame; the
    material's ax/ay axes live in it. Returns (f V3, pdf plane);
    ax == ay reproduces the isotropic ggx_eval math exactly."""
    h_raw = v3.add(wo, wi)
    hl = jnp.maximum(v3.length(h_raw), 1e-12)
    h = v3.scale(h_raw, 1.0 / hl)
    # tangent-frame components
    tf = lambda v: (v3.dot(v, t), v3.dot(v, s), v3.dot(v, n))
    hx, hy, hz = tf(h)
    ox, oy_, oz = tf(wo)
    ix, iy, iz = tf(wi)
    oh = v3.dot(wo, h)
    d = ggx_d_aniso(hx, hy, hz, ax, ay)
    g = (ggx_smith_g1_aniso(ox, oy_, oz, ax, ay)
         * ggx_smith_g1_aniso(ix, iy, iz, ax, ay))
    fres = tuple(f0[c] + (1.0 - f0[c])
                 * (1.0 - jnp.clip(oh, 0.0, 1.0)) ** 5 for c in range(3))
    denom = jnp.maximum(4.0 * oz * iz, 1e-6)
    valid = (iz > 0.0) & (oz > 0.0) & (oh > 0.0)
    spec = jnp.where(valid, d * g / denom, 0.0)
    f = v3.scale(fres, spec)
    pdf = jnp.where(valid, d * jnp.maximum(hz, 0.0)
                    / jnp.maximum(4.0 * oh, 1e-6), 0.0)
    return f, pdf


def ggx_eval(n, wo, wi, f0, alpha):
    """GGX conductor BRDF f(wo, wi) with Schlick Fresnel (F0 = `f0` V3)
    and separable Smith masking, plus the solid-angle pdf of
    sample_ggx_h-driven reflection (D·cos_h / (4·(wo·h))).
    Returns (f V3, pdf plane); both 0 where wi is under the surface."""
    h_raw = v3.add(wo, wi)
    hl = jnp.maximum(v3.length(h_raw), 1e-12)
    h = v3.scale(h_raw, 1.0 / hl)
    cos_h = v3.dot(n, h)
    cos_o = v3.dot(n, wo)
    cos_i = v3.dot(n, wi)
    oh = v3.dot(wo, h)
    d = ggx_d(cos_h, alpha)
    g = ggx_smith_g1(cos_o, alpha) * ggx_smith_g1(cos_i, alpha)
    fres = tuple(f0[c] + (1.0 - f0[c])
                 * (1.0 - jnp.clip(oh, 0.0, 1.0)) ** 5 for c in range(3))
    denom = jnp.maximum(4.0 * cos_o * cos_i, 1e-6)
    valid = (cos_i > 0.0) & (cos_o > 0.0) & (oh > 0.0)
    spec = jnp.where(valid, d * g / denom, 0.0)
    f = v3.scale(fres, spec)
    pdf = jnp.where(valid, d * jnp.maximum(cos_h, 0.0)
                    / jnp.maximum(4.0 * oh, 1e-6), 0.0)
    return f, pdf

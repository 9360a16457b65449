"""AOV (arbitrary output variable) buffers: first-hit albedo, shading
normal, and depth, averaged over jittered primary samples.

Denoisers (OIDN/OptiX-style) and compositing pipelines consume these
guide planes alongside the noisy radiance; the reference has no analog
(it draws directly to the swapchain) — this is north-star production
surface. One intersection pass per sample, reusing the production
intersectors (`wavefront._intersect`: brute force, skip-link BVH, or the
Pallas cluster sweep via a ClusterSet), so the AOVs are consistent with
what the path tracer actually hits, including the two-sided normal
orientation and per-cluster material rows.

Misses write zeros into every plane (depth 0 is the conventional "sky"
sentinel — a real hit has depth >= t_min > 0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, random

from raytracing_engine_tpu.ops import vec3 as v3
from raytracing_engine_tpu.pathtracer.integrator import PTConfig
from raytracing_engine_tpu.pathtracer.scene import PTScene
from raytracing_engine_tpu.pathtracer.wavefront import (
    _camera_rays,
    _intersect,
    _mat_lookup,
    _textured_albedo,
)


@partial(jax.jit, static_argnums=(0, 4))
def render_aovs(cfg: PTConfig, scene: PTScene, cam_pos, cam_quat, spp: int,
                key=None, bvh=None):
    """First-hit AOVs for denoising: dict with
    albedo (H, W, 3), normal (H, W, 3) — two-sided, unit, world space —
    and depth (H, W) — ray parameter t, 0 on miss; all spp-averaged with
    the same sub-pixel jitter stream as the renderers (fold_in(key, i),
    2 planes per pass). Always the pinhole view: denoiser guides want the
    sharp geometry even when the beauty pass uses depth of field."""
    if key is None:
        key = random.PRNGKey(0)
    h, w = cfg.height, cfg.width

    def one(i, acc):
        ki = random.fold_in(key, i)
        u = random.uniform(random.fold_in(ki, 0), (2, h, w))
        o, d = _camera_rays(cfg, cam_pos, cam_quat, u[0], u[1])
        isect = _intersect(scene, o, d, cfg.t_min, bvh)
        hit = isect["hit"]
        gate = jnp.where(hit, 1.0, 0.0)
        albedo, _, _, _ = _mat_lookup(scene, isect["mat_id"])
        if scene.has_texture:  # checker albedo — the denoiser demodulates
            albedo = _textured_albedo(scene, isect["mat_id"], albedo,
                                      isect["p"])
        alb, nrm, dep = acc
        alb = v3.add(alb, v3.scale(albedo, gate))
        nrm = v3.add(nrm, v3.scale(isect["n"], gate))
        dep = dep + jnp.where(hit, isect["t"], 0.0)
        return alb, nrm, dep

    zero = jnp.zeros((h, w), jnp.float32)
    alb, nrm, dep = lax.fori_loop(
        0, spp, one, ((zero, zero, zero), (zero, zero, zero), zero))
    inv = 1.0 / spp
    # re-normalize the averaged normal (average of unit vectors is not
    # unit at silhouette pixels); zero stays zero
    nlen = jnp.maximum(v3.length(nrm), 1e-20)
    nrm = v3.scale(nrm, jnp.where(nlen > 1e-6, 1.0 / nlen, 0.0))
    return dict(
        albedo=jnp.stack([p * inv for p in alb], axis=-1),
        normal=jnp.stack(list(nrm), axis=-1),
        depth=dep * inv,
    )

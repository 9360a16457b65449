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


@partial(jax.jit, static_argnums=(0, 4), static_argnames=("ao_radius",))
def render_aovs(cfg: PTConfig, scene: PTScene, cam_pos, cam_quat, spp: int,
                key=None, bvh=None, ao_radius: float = 0.0):
    """First-hit AOVs for denoising: dict with
    albedo (H, W, 3), normal (H, W, 3) — two-sided, unit, world space —
    and depth (H, W) — ray parameter t, 0 on miss; all spp-averaged with
    the same sub-pixel jitter stream as the renderers (fold_in(key, i),
    2 planes per pass). Always the pinhole view: denoiser guides want the
    sharp geometry even when the beauty pass uses depth of field.

    ao_radius > 0 adds an `ao` (H, W) plane: cosine-weighted hemisphere
    occlusion within that world-space radius (1 = fully open, spp
    any-hit probes per pixel; misses/sky read 1). The classic
    compositing/grading channel — ground-truth ray-traced AO, not a
    screen-space approximation."""
    if key is None:
        key = random.PRNGKey(0)
    h, w = cfg.height, cfg.width
    want_ao = ao_radius > 0.0

    def one(i, acc):
        ki = random.fold_in(key, i)
        n_u = 4 if want_ao else 2
        u = random.uniform(random.fold_in(ki, 0), (n_u, h, w))
        o, d = _camera_rays(cfg, cam_pos, cam_quat, u[0], u[1])
        isect = _intersect(scene, o, d, cfg.t_min, bvh)
        hit = isect["hit"]
        gate = jnp.where(hit, 1.0, 0.0)
        albedo, _, _, _ = _mat_lookup(scene, isect["mat_id"])
        if scene.has_texture:  # textured albedo — the denoiser demodulates
            albedo = _textured_albedo(scene, isect["mat_id"], albedo,
                                      isect["p"], uv=isect.get("uv"),
                                      bilinear=cfg.tex_filter == "bilinear")
        shade_n = isect["n"]
        if scene.has_normal_map:  # guide = the SHADING normal (perturbed)
            from raytracing_engine_tpu.pathtracer.wavefront import (
                _perturb_normal)

            shade_n = _perturb_normal(
                scene, isect["mat_id"], shade_n, isect["tan"], isect["uv"],
                bilinear=cfg.tex_filter == "bilinear")
        alb, nrm, dep, ao = acc
        alb = v3.add(alb, v3.scale(albedo, gate))
        nrm = v3.add(nrm, v3.scale(shade_n, gate))
        dep = dep + jnp.where(hit, isect["t"], 0.0)
        if want_ao:
            from raytracing_engine_tpu.pathtracer import sampler
            from raytracing_engine_tpu.pathtracer.wavefront import _occluded

            probe_d, _ = sampler.cosine_hemisphere(u[2], u[3], isect["n"])
            probe_o = v3.add(isect["p"], v3.scale(isect["n"], cfg.eps))
            blocked = _occluded(scene, probe_o, probe_d,
                                jnp.full((h, w), ao_radius), cfg.t_min, bvh)
            # misses count as open; sky pixels stay fully open
            ao = ao + jnp.where(hit & blocked, 0.0, 1.0)
        return alb, nrm, dep, ao

    zero = jnp.zeros((h, w), jnp.float32)
    alb, nrm, dep, ao = lax.fori_loop(
        0, spp, one, ((zero, zero, zero), (zero, zero, zero), zero, zero))
    inv = 1.0 / spp
    # re-normalize the averaged normal (average of unit vectors is not
    # unit at silhouette pixels); zero stays zero
    nlen = jnp.maximum(v3.length(nrm), 1e-20)
    nrm = v3.scale(nrm, jnp.where(nlen > 1e-6, 1.0 / nlen, 0.0))
    out = dict(
        albedo=jnp.stack([p * inv for p in alb], axis=-1),
        normal=jnp.stack(list(nrm), axis=-1),
        depth=dep * inv,
    )
    if want_ao:
        out["ao"] = ao * inv
    return out

"""Temporal reprojection accumulation for animated low-spp sequences.

The production real-time pattern's second half (the first half is the
spatial filter in denoise.py): each frame renders a few spp, and every
pixel's history from previous frames is REPROJECTED through the camera
motion and blended in — a static scene point keeps accumulating samples
across frames, so an orbiting camera converges like a progressive render
instead of starting from scratch every frame. Disocclusions (no valid
history) fall back to the current frame and rebuild history.

Reprojection math inverts the engine's camera model (compute.glsl:71-77
NDC mapping; Z-up, Y-forward): world hit point from the depth AOV ->
rotate into the PREVIOUS camera frame (conjugate quaternion) ->
perspective divide by the forward (y) component -> pixel coordinates ->
bilinear sample of the history planes. Validity = in-bounds, history
depth consistent with the reprojected point's distance, and normals
aligned — failing any resets that pixel's history length to zero.

All dense (H, W) math + one bilinear gather per frame: image-scale XLA
gathers are cheap (it is per-BOUNCE gathers inside kernels that are
not). State is a pytree; `temporal_step` is jittable and functional.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from raytracing_engine_tpu.pathtracer.integrator import PTConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TemporalState:
    irr: jax.Array       # (H, W, 3) accumulated radiance history
    depth: jax.Array     # (H, W) history depth (current frame's, post-blend)
    normal: jax.Array    # (H, W, 3) history normals
    length: jax.Array    # (H, W) effective history length (frames)
    cam_pos: jax.Array   # (3,) previous camera position
    cam_quat: jax.Array  # (4,) previous camera quaternion
    # SVGF-style temporal moments of the per-FRAME demodulated log1p
    # luminance (denoise.demod_log_lum units): same 1/(n+1) blend as
    # irr, so m2-m1^2 is the sample variance of the frames seen
    m1: jax.Array        # (H, W)
    m2: jax.Array        # (H, W)


def temporal_init(cfg: PTConfig) -> TemporalState:
    h, w = cfg.height, cfg.width
    return TemporalState(
        irr=jnp.zeros((h, w, 3), jnp.float32),
        depth=jnp.zeros((h, w), jnp.float32),
        normal=jnp.zeros((h, w, 3), jnp.float32),
        length=jnp.zeros((h, w), jnp.float32),
        cam_pos=jnp.zeros((3,), jnp.float32),
        cam_quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        m1=jnp.zeros((h, w), jnp.float32),
        m2=jnp.zeros((h, w), jnp.float32),
    )


def _world_points(cfg: PTConfig, depth, cam_pos, cam_quat):
    """Pixel-center world hit points from the depth AOV (t along the ray)."""
    from raytracing_engine_tpu.ops.quaternion import quat_rotate

    h, w = depth.shape
    ix = jnp.arange(w, dtype=jnp.float32)[None, :]
    iy = jnp.arange(h, dtype=jnp.float32)[:, None]
    ncx = ((ix + 0.5) * 2.0 / w - 1.0) * cfg.ratio[0]
    ncy = ((iy + 0.5) * 2.0 / h - 1.0) * cfg.ratio[1]
    v = jnp.stack([ncx * jnp.ones_like(ncy), jnp.ones_like(ncx * ncy),
                   ncy * jnp.ones_like(ncx)], axis=-1)
    d = quat_rotate(cam_quat, v)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return cam_pos + d * depth[..., None]


def _project(cfg: PTConfig, p_world, cam_pos, cam_quat):
    """World points -> (fy, fx) continuous pixel coords + camera distance
    in the given camera (inverse of the compute.glsl:71-77 mapping)."""
    from raytracing_engine_tpu.ops.quaternion import quat_rotate

    h, w = p_world.shape[:2]
    conj = cam_quat * jnp.array([-1.0, -1.0, -1.0, 1.0], jnp.float32)
    pc = quat_rotate(conj, p_world - cam_pos)  # camera frame: y forward
    fwd = jnp.maximum(pc[..., 1], 1e-6)
    ncx = pc[..., 0] / fwd / cfg.ratio[0]
    ncy = pc[..., 2] / fwd / cfg.ratio[1]
    fx = (ncx + 1.0) * w / 2.0 - 0.5
    fy = (ncy + 1.0) * h / 2.0 - 0.5
    dist = jnp.linalg.norm(pc, axis=-1)
    return fy, fx, dist


def _bilinear(img, fy, fx):
    """Bilinear sample of (H, W, ...) planes at continuous coords."""
    h, w = img.shape[:2]
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = jnp.clip(fx - x0, 0.0, 1.0)
    wy = jnp.clip(fy - y0, 0.0, 1.0)
    if img.ndim == 3:
        wx, wy = wx[..., None], wy[..., None]
    g = lambda yy, xx: img[yy, xx]
    return ((g(y0, x0) * (1 - wx) + g(y0, x1) * wx) * (1 - wy)
            + (g(y1, x0) * (1 - wx) + g(y1, x1) * wx) * wy)


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_history", "depth_tol", "normal_tol"))
def temporal_step(cfg: PTConfig, state: TemporalState, radiance, aovs,
                  cam_pos, cam_quat, max_history: int = 32,
                  depth_tol: float = 0.05, normal_tol: float = 0.9):
    """Blend one frame into the reprojected history.

    radiance: (H, W, 3) this frame's (low-spp) render from (cam_pos,
    cam_quat); aovs: render_aovs() dict for the SAME pose. Returns
    (new_state, accumulated image). Blend weight is 1/(len+1) capped at
    1/max_history — a static camera reproduces the running mean exactly
    (progressive-accumulation semantics) until the cap, then becomes an
    EMA that adapts to slow lighting change."""
    rad = jnp.asarray(radiance, jnp.float32)
    dep = jnp.asarray(aovs["depth"], jnp.float32)
    nrm = jnp.asarray(aovs["normal"], jnp.float32)
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    cam_quat = jnp.asarray(cam_quat, jnp.float32)
    h, w = dep.shape

    p_world = _world_points(cfg, dep, cam_pos, cam_quat)
    fy, fx, prev_dist = _project(cfg, p_world, state.cam_pos, state.cam_quat)

    hist_irr = _bilinear(state.irr, fy, fx)
    hist_dep = _bilinear(state.depth, fy, fx)
    hist_nrm = _bilinear(state.normal, fy, fx)
    hist_len = _bilinear(state.length, fy, fx)
    hist_m1 = _bilinear(state.m1, fy, fx)
    hist_m2 = _bilinear(state.m2, fy, fx)

    in_bounds = (fx >= 0) & (fx <= w - 1) & (fy >= 0) & (fy <= h - 1)
    # the history depth is the PREVIOUS camera's ray length to the same
    # surface point — compare against this frame's point distance to the
    # previous camera. The tolerance scales with the local depth GRADIENT
    # (SVGF's rule): on grazing surfaces one pixel of reprojection or AA
    # jitter legitimately moves depth by |grad z|, and a flat relative
    # tolerance would reject half the ground plane (measured).
    gx = jnp.abs(dep - jnp.roll(dep, 1, axis=1))
    gy = jnp.abs(dep - jnp.roll(dep, 1, axis=0))
    grad = jnp.maximum(gx, gy)
    depth_ok = jnp.abs(hist_dep - prev_dist) <= (
        depth_tol * jnp.maximum(prev_dist, 1e-3) + 4.0 * grad)
    normal_ok = jnp.sum(hist_nrm * nrm, axis=-1) >= normal_tol * jnp.maximum(
        jnp.linalg.norm(hist_nrm, axis=-1), 1e-6)
    hit = dep > 0.0
    valid = in_bounds & depth_ok & normal_ok & hit & (hist_len > 0.0)

    n_eff = jnp.where(valid, jnp.minimum(hist_len, float(max_history - 1)),
                      0.0)
    alpha = 1.0 / (n_eff + 1.0)
    out = jnp.where(
        hit[..., None],
        hist_irr * (1.0 - alpha[..., None]) + rad * alpha[..., None],
        rad)  # sky: always the fresh frame

    # temporal moments of the per-frame demodulated log luminance (same
    # blend weights): variance feeds the spatial filter's edge-stops —
    # see temporal_noise()
    from raytracing_engine_tpu.pathtracer.denoise import demod_log_lum

    lum_f = demod_log_lum(rad, jnp.asarray(aovs["albedo"], jnp.float32))
    m1 = hist_m1 * (1.0 - alpha) + lum_f * alpha
    m2 = hist_m2 * (1.0 - alpha) + lum_f * lum_f * alpha
    new_state = TemporalState(
        irr=out, depth=dep, normal=nrm,
        length=jnp.where(hit, n_eff + 1.0, 0.0),
        cam_pos=cam_pos, cam_quat=cam_quat,
        m1=jnp.where(hit, m1, 0.0), m2=jnp.where(hit, m2, 0.0))
    return new_state, out


def temporal_noise(state: TemporalState, min_history: float = 4.0):
    """(H, W) noise plane for denoise(noise=...): the temporally-estimated
    standard error of the ACCUMULATED mean, sqrt(var/len), in
    demod_log_lum units. Pixels with fewer than min_history frames return
    0, and denoise(noise=...) falls back to its own single-frame local
    estimate exactly there. SVGF's construction: temporal variance is
    far tighter than any single-frame spatial estimate once a few frames
    of history exist."""
    var = jnp.maximum(state.m2 - state.m1 * state.m1, 0.0)
    se = jnp.sqrt(var / jnp.maximum(state.length, 1.0))
    return jnp.where(state.length >= min_history, se, 0.0)

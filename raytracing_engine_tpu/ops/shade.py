"""Phong shading with sphere-traced soft shadows (vectorized).

Exact math of reference shaders/fragment.glsl:127-187 over a batch of rays:
nearest-object lookup (material paired by index, :144-156), camera/normal
falloffs (:162-167), per-light diffuse + specular with distance falloff and
a soft-shadow factor whose march origin is offset 1.0 along the light
direction (:170-186).

Lights are processed sequentially (a static unrolled loop over MAX_LIGHTS
with dead lights masked via end=0) to keep peak memory at one shadow-march
state per batch instead of MAX_LIGHTS of them.

Deliberate deviation: the specular base dot(reflect(-l,n), camDir) is clamped
to 0 before ``pow`` because GLSL pow is undefined for negative bases
(fragment.glsl:47-50); results agree wherever GLSL is defined.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_engine_tpu.config import (
    CAM_FALL_OFF,
    LIGHT_FALL_OFF,
    MAX_LIGHTS,
)
from raytracing_engine_tpu.ops.march import shadow_march
from raytracing_engine_tpu.ops.sdf import scene_sdf_all


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def phong_shade(
    total_dist,    # (...,) depth along each ray
    direction,     # (..., 3) unit ray direction
    cam_pos,       # (3,)
    scene,         # Scene pytree
    render_dist: float,
    max_shadow_steps: int,
    light_offset=0,          # first light slot this call handles (traced ok)
    num_light_slots: int = MAX_LIGHTS,  # static count of slots to process
):
    """Returns (..., 3) linear RGB; rays with depth >= render_dist are black.

    light_offset/num_light_slots support sharding lights across devices
    (parallel/sharding.py): each shard sums its slots' contributions and the
    caller psums — valid because the reference accumulates per-light terms
    additively, including the per-light ambient term (fragment.glsl:183-185).
    """
    obj_mask = jnp.arange(scene.obj_pos.shape[0]) < scene.obj_count

    position = cam_pos + direction * total_dist[..., None]

    # nearest object by SDF; argmin = first-min, matching the strict '<' scan
    # at fragment.glsl:148-156
    dists = scene_sdf_all(position, scene.obj_pos, scene.obj_radius)
    dists = jnp.where(obj_mask, dists, jnp.inf)
    idx = jnp.argmin(dists, axis=-1)  # (...,)

    obj_pos = scene.obj_pos[idx]           # (..., 3)
    mat_color = scene.mat_color[idx]       # (..., 3)
    mat_shine = scene.mat_shine[idx]       # (...,)
    mat_ambient = scene.mat_ambient[idx]   # (...,)

    cam_dist = jnp.sqrt(jnp.sum((position - cam_pos) ** 2, axis=-1))
    cam_fall = jnp.maximum(CAM_FALL_OFF * (cam_dist * cam_dist + 1.0), 1.0)

    normal = _normalize(position - obj_pos)
    normal_fall = jnp.maximum(jnp.sum(normal * -direction, axis=-1), 0.0)

    # Only shade rays that hit; masked rays still march (their lanes idle out
    # quickly because end=0 below would not apply — instead we zero at the end
    # like the reference's early return to black, fragment.glsl:137-140).
    hit_mask = total_dist < render_dist

    color = jnp.zeros(position.shape[:-1] + (3,), jnp.float32)
    for li in range(num_light_slots):
        slot = light_offset + li
        light_live = slot < scene.light_count  # traced bool scalar
        lpos = jax.lax.dynamic_index_in_dim(scene.light_pos, slot, keepdims=False)
        lcol = jax.lax.dynamic_index_in_dim(scene.light_color, slot, keepdims=False)

        to_light = lpos - position
        light_dist = jnp.sqrt(jnp.sum(to_light * to_light, axis=-1))
        light_dir = to_light / light_dist[..., None]

        # dead lights and missed rays march zero steps (end = 0)
        end = jnp.where(light_live & hit_mask, light_dist, 0.0)
        soft = shadow_march(
            position + light_dir,  # +1.0 offset — fragment.glsl:176
            light_dir,
            end,
            scene.obj_pos,
            scene.obj_radius,
            obj_mask,
            max_shadow_steps,
        )
        soft = jnp.minimum(soft, 1.0)

        light_fall = jnp.maximum(LIGHT_FALL_OFF * light_dist * light_dist, 1.0)
        diffuse = jnp.maximum(jnp.sum(normal * light_dir, axis=-1), 0.0)
        # reflect(-l, n) = -l - 2*dot(n, -l)*n
        refl = -light_dir - 2.0 * jnp.sum(normal * -light_dir, axis=-1, keepdims=True) * normal
        base = jnp.maximum(jnp.sum(refl * -direction, axis=-1), 0.0)
        spec = jnp.maximum(diffuse * jnp.power(base, mat_shine), 0.0)

        direct = (
            jnp.maximum(diffuse + spec, 0.0)[..., None]
            * lcol
            / light_fall[..., None]
            * soft[..., None]
        )
        contrib = (
            (mat_ambient[..., None] + direct)
            / cam_fall[..., None]
            * normal_fall[..., None]
            * mat_color
        )
        color = color + jnp.where(light_live, contrib, 0.0)

    return jnp.where(hit_mask[..., None], color, 0.0)

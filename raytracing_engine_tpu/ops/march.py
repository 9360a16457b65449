"""Cone march and shadow march as bounded, masked XLA while-loops.

The reference's data-dependent GLSL while-loops (compute.glsl:44-66,
fragment.glsl:99-119) become ``lax.while_loop`` over vectorized per-ray state
with an active-lane mask; the loop exits when every lane is done or at a
static safety bound. The algorithm-3 lazy SDF cache (compute.glsl:51-57) is
kept *semantically* — `cache - last` is the 1-Lipschitz lower bound, refreshed
only when it dips below the gate — as fully-vectorized selects, so marched
trajectories match the scalar reference step for step (same positions, same
step lengths, same termination), which is what makes pixel-parity tests
possible. With <= 8 objects the selects cost nothing on the VPU.

All functions take SoA scene arrays (not the Scene pytree) so they can be
reused verbatim inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from raytracing_engine_tpu.config import RAY_RADIUS
from raytracing_engine_tpu.ops.sdf import scene_sdf_all


def cone_march(
    origin,        # (..., 3) march start (already offset by the seed depth)
    direction,     # (..., 3) unit ray direction
    threshold,     # scalar — cone growth per unit length (compute.glsl:75)
    obj_pos,       # (K, 3)
    obj_radius,    # (K,)
    obj_mask,      # (K,) bool — slot i live iff i < obj_count
    render_dist: float,
    max_steps: int,
):
    """Algorithm-3 cone march. Returns (...,) marched length.

    Per-lane semantics are exactly compute.glsl:34-68:
        while len < RENDER_DIST:
            radius = (len + 1) * threshold
            per object: cache -= last; if cache <= radius: cache = sdf(pos)
            dist = min(RENDER_DIST, min(cache))
            last = max(dist, 0); len += last
            if dist <= radius: len -= radius; break
    """
    big = jnp.float32(render_dist)

    # compute.glsl:37-39 — cache initialized at the march origin.
    cache0 = scene_sdf_all(origin, obj_pos, obj_radius)
    # derive zero carries from the inputs (not fresh constants) so their
    # varying-axis types match the loop body under shard_map
    length0 = jnp.sum(origin, axis=-1) * 0.0
    last0 = length0
    done0 = length0 > 0.0

    def cond(state):
        length, last, cache, done, it = state
        return (it < max_steps) & jnp.any(~done & (length < big))

    def body(state):
        length, last, cache, done, it = state
        active = ~done & (length < big)

        position = origin + direction * length[..., None]
        radius = (length + 1.0) * threshold
        bound = cache - last[..., None]
        fresh = scene_sdf_all(position, obj_pos, obj_radius)
        updated = jnp.where(bound <= radius[..., None], fresh, bound)
        dist = jnp.min(jnp.where(obj_mask, updated, big), axis=-1)
        dist = jnp.minimum(dist, big)

        new_last = jnp.maximum(dist, 0.0)
        new_length = length + new_last
        hit = dist <= radius
        new_length = jnp.where(hit, new_length - radius, new_length)

        length = jnp.where(active, new_length, length)
        last = jnp.where(active, new_last, last)
        cache = jnp.where(active[..., None], updated, cache)
        done = done | (active & hit)
        return (length, last, cache, done, it + 1)

    length, _, _, _, _ = lax.while_loop(
        cond, body, (length0, last0, cache0, done0, jnp.int32(0))
    )
    return length


def shadow_march(
    origin,       # (..., 3) — already offset +1.0 along the light dir
    direction,    # (..., 3) unit direction toward the light
    end,          # (...,)  march cutoff (distance to the light); end <= 0 skips
    obj_pos,
    obj_radius,
    obj_mask,
    max_steps: int,
):
    """Soft-shadow march — fragment.glsl:89-121. Returns (...,) factor.

    0 if occluded (dist <= RAY_RADIUS at any step), else the running minimum
    distance encountered (init 1.0), which the caller clamps to <= 1.
    The lazy-eval gate here is the running min `nearest`, not the cone radius.
    """
    ray_r = jnp.float32(RAY_RADIUS)

    cache0 = scene_sdf_all(origin, obj_pos, obj_radius)
    # zero carries derived from inputs — see cone_march for the shard_map
    # varying-type rationale
    length0 = jnp.sum(origin, axis=-1) * 0.0 + end * 0.0
    last0 = length0
    nearest0 = length0 + 1.0
    occluded0 = length0 > 0.0

    def cond(state):
        length, last, nearest, cache, occluded, it = state
        return (it < max_steps) & jnp.any(~occluded & (length < end))

    def body(state):
        length, last, nearest, cache, occluded, it = state
        active = ~occluded & (length < end)

        position = origin + direction * length[..., None]
        bound = cache - last[..., None]
        fresh = scene_sdf_all(position, obj_pos, obj_radius)
        updated = jnp.where(bound <= nearest[..., None], fresh, bound)
        dist = jnp.min(jnp.where(obj_mask, updated, end[..., None]), axis=-1)
        dist = jnp.minimum(dist, end)

        hit = dist <= ray_r
        new_last = jnp.maximum(dist, 0.0)
        new_nearest = jnp.minimum(nearest, dist)
        new_length = length + new_last + ray_r

        # A lane that hits keeps nearest/length frozen; occluded flag decides.
        advance = active & ~hit
        length = jnp.where(advance, new_length, length)
        last = jnp.where(advance, new_last, last)
        nearest = jnp.where(advance, new_nearest, nearest)
        cache = jnp.where(active[..., None], updated, cache)
        occluded = occluded | (active & hit)
        return (length, last, nearest, cache, occluded, it + 1)

    _, _, nearest, _, occluded, _ = lax.while_loop(
        cond, body, (length0, last0, nearest0, cache0, occluded0, jnp.int32(0))
    )
    return jnp.where(occluded, 0.0, nearest)

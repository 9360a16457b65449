"""Instanced cluster intersector — two-level acceleration, TPU-native.

BASELINE config 5: N instances of one base mesh. The base mesh's ClusterSet
(tables in VMEM) is shared; each instance is 13 scalars in SMEM (world->
object rotation rows, translation, uniform scale). Per ray tile:

  outer loop over instances:
    - scalar world-AABB pre-cull (vector slab test, `lax.cond` skip)
    - transform the tile's rays into object space (scalar-broadcast mults)
    - inner cluster sweep bounded by the current best t (world units)

The winning hit is encoded as instance * padded_tris + slot. VMEM holds one
base mesh regardless of instance count — 1M+ effective triangles from a
70k-entry table.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_engine_tpu.accel.clusters import CLUSTER, ClusterSet

_INF = np.float32(np.inf)


def pack_instances(inst):
    """accel.instancing.InstancedMesh -> (inst_tab (N, 24) f32) for SMEM:
    rows [inv_rot(9, row-major), trans(3), scale(1), world_bb_min(3),
    world_bb_max(3), rot(... not needed in-kernel), pads]."""
    n = inst.num_instances
    tab = jnp.concatenate(
        [
            inst.inv_rot.reshape(n, 9),
            inst.trans,
            inst.scale[:, None],
            inst.aabb_min,
            inst.aabb_max,
            jnp.zeros((n, 5), jnp.float32),
        ],
        axis=1,
    )  # (N, 24)
    return tab


def _cluster_sweep(boxes_ref, tri_ref, ox, oy, oz, dx, dy, dz,
                   t, idx, ray_gate, idx_base, t_min, n_clusters):
    """Closest-hit sweep of all clusters for (already transformed) rays.
    t/idx are carried planes in OBJECT-space units; idx_base offsets stored
    slots (instance encoding). ray_gate masks lanes allowed to update."""
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    def cond(state):
        c, t, idx = state
        return c < n_clusters

    def body(state):
        c, t, idx = state
        bminx = boxes_ref[c, 0]
        bminy = boxes_ref[c, 1]
        bminz = boxes_ref[c, 2]
        bmaxx = boxes_ref[c, 3]
        bmaxy = boxes_ref[c, 4]
        bmaxz = boxes_ref[c, 5]

        tx0 = (bminx - ox) * inv_dx
        tx1 = (bmaxx - ox) * inv_dx
        ty0 = (bminy - oy) * inv_dy
        ty1 = (bmaxy - oy) * inv_dy
        tz0 = (bminz - oz) * inv_dz
        tz1 = (bmaxz - oz) * inv_dz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        ray_hit = (t_near <= t_far) & (t_far > t_min) & (t_near < t) & ray_gate
        cluster_hit = jnp.any(ray_hit)

        def hit_fn(args):
            t, idx = args
            base = pl.multiple_of(c * CLUSTER, CLUSTER)
            blk = tri_ref[:, pl.ds(base, CLUSTER)]
            for k in range(CLUSTER):
                v0x = blk[0, k]
                v0y = blk[1, k]
                v0z = blk[2, k]
                e1x = blk[3, k]
                e1y = blk[4, k]
                e1z = blk[5, k]
                e2x = blk[6, k]
                e2y = blk[7, k]
                e2z = blk[8, k]

                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                u = (tvx * px + tvy * py + tvz * pz) * inv
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = (
                    ray_hit
                    & (jnp.abs(det) >= 1e-9)
                    & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (tt > t_min) & (tt < t)
                )
                t = jnp.where(ok, tt, t)
                idx = jnp.where(
                    ok, (idx_base + jnp.float32(1.0) * (c * CLUSTER + k)), idx
                )
            return t, idx

        t, idx = lax.cond(cluster_hit, hit_fn, lambda a: a, (t, idx))
        return (c + 1, t, idx)

    _, t, idx = lax.while_loop(cond, body, (jnp.int32(0), t, idx))
    return t, idx


def _instanced_kernel(inst_ref, boxes_ref, tri_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      out_t_ref, out_idx_ref,
                      *, n_instances, n_clusters, t_pad, t_min):
    wox, woy, woz = ox_ref[:], oy_ref[:], oz_ref[:]
    wdx, wdy, wdz = dx_ref[:], dy_ref[:], dz_ref[:]
    winv_dx = 1.0 / wdx
    winv_dy = 1.0 / wdy
    winv_dz = 1.0 / wdz

    t0 = jnp.full_like(wox, _INF)     # WORLD-space best t
    idx0 = jnp.zeros_like(wox) - 1.0

    def body(k, carry):
        t_w, idx = carry

        # world AABB pre-cull for this instance
        bminx = inst_ref[k, 13]
        bminy = inst_ref[k, 14]
        bminz = inst_ref[k, 15]
        bmaxx = inst_ref[k, 16]
        bmaxy = inst_ref[k, 17]
        bmaxz = inst_ref[k, 18]
        tx0 = (bminx - wox) * winv_dx
        tx1 = (bmaxx - wox) * winv_dx
        ty0 = (bminy - woy) * winv_dy
        ty1 = (bmaxy - woy) * winv_dy
        tz0 = (bminz - woz) * winv_dz
        tz1 = (bmaxz - woz) * winv_dz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        gate = (t_near <= t_far) & (t_far > t_min) & (t_near < t_w)

        def inst_fn(args):
            t_w, idx = args
            # world -> object: o' = R^T (o - trans) / s ; d' = R^T d
            r00, r01, r02 = inst_ref[k, 0], inst_ref[k, 1], inst_ref[k, 2]
            r10, r11, r12 = inst_ref[k, 3], inst_ref[k, 4], inst_ref[k, 5]
            r20, r21, r22 = inst_ref[k, 6], inst_ref[k, 7], inst_ref[k, 8]
            tx, ty, tz = inst_ref[k, 9], inst_ref[k, 10], inst_ref[k, 11]
            s = inst_ref[k, 12]
            inv_s = 1.0 / s

            sx, sy, sz = wox - tx, woy - ty, woz - tz
            ox = (r00 * sx + r01 * sy + r02 * sz) * inv_s
            oy = (r10 * sx + r11 * sy + r12 * sz) * inv_s
            oz = (r20 * sx + r21 * sy + r22 * sz) * inv_s
            dx = r00 * wdx + r01 * wdy + r02 * wdz
            dy = r10 * wdx + r11 * wdy + r12 * wdz
            dz = r20 * wdx + r21 * wdy + r22 * wdz

            t_obj = t_w * inv_s  # object-space bound from current world best
            t_obj, idx = _cluster_sweep(
                boxes_ref, tri_ref, ox, oy, oz, dx, dy, dz,
                t_obj, idx, gate, jnp.float32(1.0) * (k * t_pad),
                t_min * inv_s, n_clusters,
            )
            return t_obj * s, idx

        t_w, idx = lax.cond(jnp.any(gate), inst_fn, lambda a: a, (t_w, idx))
        return (t_w, idx)

    t_w, idx = lax.fori_loop(0, n_instances, body, (t0, idx0))
    out_t_ref[:] = jnp.where(idx >= 0.0, t_w, _INF)
    out_idx_ref[:] = idx.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("t_min", "tile", "interpret")
)
def instanced_cluster_intersect(inst_tab, cs: ClusterSet, o_planes, d_planes,
                                t_min=1e-3, tile=(16, 256), interpret=None):
    """Closest hit over all instances of the base ClusterSet.

    inst_tab: pack_instances(...) output. Returns (t_world (H,W) — inf miss,
    code (H,W) int32 — instance * cs.padded_tris + slot, -1 miss).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = o_planes[0].shape
    from raytracing_engine_tpu.ops.pallas.common import pick_tile

    tile_h, tile_w = pick_tile(h, w, *tile)
    grid = (h // tile_h, w // tile_w)

    kernel = functools.partial(
        _instanced_kernel,
        n_instances=inst_tab.shape[0],
        n_clusters=cs.num_clusters,
        t_pad=cs.padded_tris,
        t_min=t_min,
    )
    blk = lambda: pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
    t, code = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # instances
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cluster boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows
            blk(), blk(), blk(), blk(), blk(), blk(),
        ],
        out_specs=(blk(), blk()),
        interpret=interpret,
    )(inst_tab, cs.boxes, cs.tri,
      o_planes[0], o_planes[1], o_planes[2],
      d_planes[0], d_planes[1], d_planes[2])
    return t, code

"""Pallas packet BVH traversal — the TPU-native triangle intersector.

Design (the "laid out for coalesced gathers" north-star line, rethought for
what TPUs are actually good at): per-lane pointer chasing is the one thing
the VPU cannot do, so the packet makes the traversal state SCALAR and the
geometry tests VECTOR:

- the whole (tile_h, tile_w) ray tile walks the stackless skip-link BVH
  (accel/bvh.py layout) together with ONE scalar node cursor;
- per node, the AABB slab test runs vectorized over every ray in the tile
  against scalar box bounds (SMEM-friendly scalar loads, zero gathers);
- a leaf's <= LEAF_SIZE triangles are fetched as scalars and tested with
  vector Möller-Trumbore under a scalar `lax.cond` (skipped entirely when no
  ray in the tile touches the node);
- node/triangle tables live whole in VMEM (a 70k-tri mesh is ~4 MB — fits),
  so traversal never touches HBM after the initial fill.

Coherent packets (primary/shadow rays) visit near the per-ray optimal node
set; incoherent bounce packets degrade toward the union — the standard
packet trade-off, mitigated by smaller tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_engine_tpu.accel.bvh import BVH, LEAF_SIZE


def pack_bvh_tables(bvh: BVH):
    """Flatten a BVH into kernel tables, TRANSPOSED so the big axis rides
    the 128 lanes (an (N, 8) table in VMEM would be lane-padded to (N, 128)
    — a 10x memory blowup that OOMs VMEM for 70k-tri meshes):

    node_bb (8, N) f32: rows [minx,miny,minz,maxx,maxy,maxz,pad,pad]
    node_meta (8, N) i32: rows [first_tri, tri_count, skip, pads...]
    tri (16, T) f32: rows [v0.xyz, e1.xyz, e2.xyz, pads...]
    """
    node_bb = jnp.concatenate(
        [bvh.bb_min.T, bvh.bb_max.T,
         jnp.zeros((2, bvh.bb_min.shape[0]), jnp.float32)], axis=0
    )
    node_meta = jnp.concatenate(
        [jnp.stack([bvh.first_tri, bvh.tri_count, bvh.skip]),
         jnp.zeros((5, bvh.first_tri.shape[0]), jnp.int32)], axis=0
    )
    tri = jnp.concatenate(
        [bvh.v0.T, bvh.e1.T, bvh.e2.T,
         jnp.zeros((7, bvh.v0.shape[0]), jnp.float32)], axis=0
    )
    return node_bb, node_meta, tri


def _traverse_kernel(node_bb_ref, node_meta_ref, tri_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmax_ref, out_t_ref, out_idx_ref,
                     *, n_nodes, t_min, any_hit, max_steps):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    t0 = tmax_ref[:]
    idx0 = jnp.zeros_like(t0) - 1.0  # f32 carry (i1/int planes as carries
    #                                   are fragile in Mosaic; cast at store)

    def cond(state):
        cursor, t, idx, steps = state
        return (cursor < n_nodes) & (steps < max_steps)

    def body(state):
        cursor, t, idx, steps = state

        bminx = node_bb_ref[0, cursor]
        bminy = node_bb_ref[1, cursor]
        bminz = node_bb_ref[2, cursor]
        bmaxx = node_bb_ref[3, cursor]
        bmaxy = node_bb_ref[4, cursor]
        bmaxz = node_bb_ref[5, cursor]

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
        ray_hit = (t_near <= t_far) & (t_far > t_min) & (t_near < t)
        if any_hit:
            ray_hit = ray_hit & (idx < 0.0)  # finished lanes stop testing
        node_hit = jnp.any(ray_hit)

        first = node_meta_ref[0, cursor]
        count = node_meta_ref[1, cursor]
        skip = node_meta_ref[2, cursor]
        is_leaf = first >= 0

        def leaf_fn(args):
            t, idx = args
            for k in range(LEAF_SIZE):
                ti = first + k
                tis = jnp.minimum(ti, tri_ref.shape[1] - 1)
                v0x = tri_ref[0, tis]
                v0y = tri_ref[1, tis]
                v0z = tri_ref[2, tis]
                e1x = tri_ref[3, tis]
                e1y = tri_ref[4, tis]
                e1z = tri_ref[5, tis]
                e2x = tri_ref[6, tis]
                e2y = tri_ref[7, tis]
                e2z = tri_ref[8, tis]

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
                    (k < count)
                    & ray_hit
                    & (jnp.abs(det) >= 1e-9)
                    & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (tt > t_min) & (tt < t)
                )
                t = jnp.where(ok, tt, t)
                idx = jnp.where(ok, ti.astype(jnp.float32), idx)
            return t, idx

        t, idx = lax.cond(node_hit & is_leaf, leaf_fn, lambda a: a, (t, idx))

        next_cursor = jnp.where(
            node_hit & jnp.logical_not(is_leaf), cursor + 1, skip
        )
        if any_hit:
            # whole tile occluded -> bail out
            next_cursor = jnp.where(jnp.any(idx < 0.0), next_cursor, n_nodes)
        return (next_cursor, t, idx, steps + 1)

    _, t, idx, _ = lax.while_loop(
        cond, body, (jnp.int32(0), t0, idx0, jnp.int32(0))
    )
    out_t_ref[:] = jnp.where(idx >= 0.0, t, jnp.float32(jnp.inf))
    out_idx_ref[:] = idx.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "any_hit", "tile", "interpret", "max_steps"),
)
def bvh_intersect_packet(tables, o_planes, d_planes, t_max,
                         t_min=1e-3, any_hit=False, tile=(16, 256),
                         interpret=None, max_steps=500_000):
    """Packet-traverse a BVH for an (H, W) plane grid of rays.

    tables: pack_bvh_tables(bvh) output; o_planes/d_planes: V3 plane tuples;
    t_max: (H, W) per-ray upper bound (inf for closest-hit).
    Returns (t (H, W) — inf on miss, tri_idx (H, W) int32 — REORDERED index,
    -1 on miss).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    node_bb, node_meta, tri = tables
    h, w = o_planes[0].shape
    from raytracing_engine_tpu.ops.pallas.common import pick_tile

    tile_h, tile_w = pick_tile(h, w, *tile)
    grid = (h // tile_h, w // tile_w)

    kernel = functools.partial(
        _traverse_kernel,
        n_nodes=node_bb.shape[1],
        t_min=t_min,
        any_hit=any_hit,
        max_steps=max_steps,
    )
    blk = lambda: pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    t, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        grid=grid,
        in_specs=[full(), full(), full(),
                  blk(), blk(), blk(), blk(), blk(), blk(), blk()],
        out_specs=(blk(), blk()),
        interpret=interpret,
    )(node_bb, node_meta, tri,
      o_planes[0], o_planes[1], o_planes[2],
      d_planes[0], d_planes[1], d_planes[2], t_max)
    return t, idx

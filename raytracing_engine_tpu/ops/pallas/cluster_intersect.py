"""Pallas cluster intersector — dense triangle intersection for TPU.

Per ray tile: a while-loop over clusters reads the cluster AABB from SMEM
(dynamic sublane index — supported), slab-tests it vectorized against the
tile, and only when some ray touches the box does a `lax.cond` run 128
vector Möller-Trumbore tests against the cluster's lane-aligned (16, 128)
VMEM slice. No gathers, no dynamic lane indexing anywhere.

Closest-hit and any-hit (shadow) variants; any-hit exits as soon as the
whole tile is occluded.
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


def _cluster_kernel(order_ref, boxes_ref, tri_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmax_ref, *out_refs,
                    n_clusters, t_min, any_hit, strips, attrs):
    if attrs:
        (out_t_ref, out_idx_ref, out_nx_ref, out_ny_ref, out_nz_ref,
         out_mat_ref, out_area_ref) = out_refs
    else:
        out_t_ref, out_idx_ref = out_refs
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    t0 = tmax_ref[:]
    idx0 = jnp.zeros_like(t0) - 1.0  # f32 idx carry; cast at store
    zero = jnp.zeros_like(t0)
    # hit-attribute planes (normal, material, 2*area) carried through the
    # sweep so callers need NO post-kernel gathers
    attr0 = (zero, zero, zero, zero, zero)

    def cond(state):
        ci, t, idx, live, attr = state
        return (ci < n_clusters) & (live != 0.0)

    def body(state):
        ci, t, idx, live, attr = state
        c = order_ref[ci]  # near-to-far visit order (perf hint only)

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
        ray_hit = (t_near <= t_far) & (t_far > t_min) & (t_near < t)
        if any_hit:
            ray_hit = ray_hit & (idx < 0.0)
        cluster_hit = jnp.any(ray_hit)

        def hit_fn(args):
            t, idx, attr = args
            base = pl.multiple_of(c * CLUSTER, CLUSTER)
            blk = tri_ref[:, pl.ds(base, CLUSTER)]  # (16, 128), lane-aligned

            def mt_strip(rh, sox, soy, soz, sdx, sdy, sdz, st_, sidx, sattr):
                anx, any_, anz, amat, aarea = sattr
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

                    px = sdy * e2z - sdz * e2y
                    py = sdz * e2x - sdx * e2z
                    pz = sdx * e2y - sdy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
                    tvx = sox - v0x
                    tvy = soy - v0y
                    tvz = soz - v0z
                    u = (tvx * px + tvy * py + tvz * pz) * inv
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    v = (sdx * qx + sdy * qy + sdz * qz) * inv
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                    ok = (
                        rh
                        & (jnp.abs(det) >= 1e-9)
                        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (tt > t_min) & (tt < st_)
                    )
                    st_ = jnp.where(ok, tt, st_)
                    sidx = jnp.where(ok, jnp.float32(1.0) * (c * CLUSTER + k), sidx)
                    if attrs:
                        cnx = e1y * e2z - e1z * e2y
                        cny = e1z * e2x - e1x * e2z
                        cnz = e1x * e2y - e1y * e2x
                        anx = jnp.where(ok, cnx, anx)
                        any_ = jnp.where(ok, cny, any_)
                        anz = jnp.where(ok, cnz, anz)
                        amat = jnp.where(ok, blk[9, k], amat)
                        aarea = jnp.where(
                            ok, jnp.sqrt(cnx * cnx + cny * cny + cnz * cnz),
                            aarea)
                return st_, sidx, (anx, any_, anz, amat, aarea)

            # row-strip gating: only strips whose rays touch the box pay for
            # the 128 triangle tests (cluster boxes usually clip a tile edge)
            th = t.shape[0]
            n_strips = strips if (th % strips == 0 and th >= 2 * strips) else 1
            if n_strips != 1 and attrs:
                n_strips = 1  # attr carries not threaded through strips
            sh = th // n_strips
            if n_strips == 1:
                return mt_strip(ray_hit, ox, oy, oz, dx, dy, dz, t, idx, attr)
            t_out = []
            idx_out = []
            for q in range(n_strips):
                sl = slice(q * sh, (q + 1) * sh)
                rh = ray_hit[sl]
                st_, sidx, _ = lax.cond(
                    jnp.any(rh),
                    lambda a, _sl=sl, _rh=rh: mt_strip(
                        _rh, ox[_sl], oy[_sl], oz[_sl],
                        dx[_sl], dy[_sl], dz[_sl], a[0], a[1], attr0),
                    lambda a: a,
                    (t[sl], idx[sl], attr0),
                )
                t_out.append(st_)
                idx_out.append(sidx)
            return (jnp.concatenate(t_out, 0), jnp.concatenate(idx_out, 0),
                    attr)

        t, idx, attr = lax.cond(cluster_hit, hit_fn, lambda a: a,
                                (t, idx, attr))

        if any_hit:
            live = jnp.where(jnp.any(idx < 0.0), 1.0, 0.0)
        return (ci + 1, t, idx, live, attr)

    _, t, idx, _, attr = lax.while_loop(
        cond, body, (jnp.int32(0), t0, idx0, jnp.float32(1.0), attr0)
    )
    out_t_ref[:] = jnp.where(idx >= 0.0, t, _INF)
    out_idx_ref[:] = idx.astype(jnp.int32)
    if attrs:
        out_nx_ref[:] = attr[0]
        out_ny_ref[:] = attr[1]
        out_nz_ref[:] = attr[2]
        out_mat_ref[:] = attr[3]
        out_area_ref[:] = attr[4] * 0.5  # |cross|/2 = triangle area


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "any_hit", "tile", "interpret", "strips", "attrs"),
)
def cluster_intersect(cs: ClusterSet, o_planes, d_planes, t_max,
                      t_min=1e-3, any_hit=False, tile=(16, 256),
                      interpret=None, strips=1, attrs=False, order=None):
    """Intersect an (H, W) ray-plane grid against a ClusterSet.

    Returns (t (H,W) — inf on miss, tri_idx (H,W) int32 — PADDED-REORDERED
    slot, -1 on miss; map back with cs.perm).

    attrs=True additionally returns (nx, ny, nz, mat, area): unnormalized
    geometric normal (e1 x e2), material id (f32, from tri row 9) and
    triangle area of the hit — selected in-kernel, so callers need no
    post-kernel gathers. Incompatible with strips gating (falls back to 1).

    order: optional (C,) int32 visit order (accel.clusters.visit_order) —
    near-to-far ordering lets the running t cull far boxes; pure perf hint.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = o_planes[0].shape
    from raytracing_engine_tpu.ops.pallas.common import pick_tile

    tile_h, tile_w = pick_tile(h, w, *tile)
    grid = (h // tile_h, w // tile_w)

    kernel = functools.partial(
        _cluster_kernel,
        n_clusters=cs.num_clusters,
        t_min=t_min,
        any_hit=any_hit,
        # row-strip gating MEASURED SLOWER on v5e for the bench scenes
        # (533 vs 457 ms at 512^2: per-strip scalar conds cost more than the
        # skipped vector MT work) — default off, kept selectable for scenes
        # with tighter cluster/tile overlap
        strips=1 if interpret else strips,
        attrs=attrs,
    )
    blk = lambda: pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
    if order is None:
        order = jnp.arange(cs.num_clusters, dtype=jnp.int32)
    f32 = lambda: jax.ShapeDtypeStruct((h, w), jnp.float32)
    out_shape = [f32(), jax.ShapeDtypeStruct((h, w), jnp.int32)]
    if attrs:
        out_shape += [f32(), f32(), f32(), f32(), f32()]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # visit order
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri rows (16, T_pad)
            blk(), blk(), blk(), blk(), blk(), blk(), blk(),
        ],
        out_specs=tuple(blk() for _ in out_shape),
        interpret=interpret,
    )(order, cs.boxes, cs.tri,
      o_planes[0], o_planes[1], o_planes[2],
      d_planes[0], d_planes[1], d_planes[2],
      jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (h, w)))
    return outs if attrs else (outs[0], outs[1])

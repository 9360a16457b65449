"""Pallas cluster intersector — dense triangle intersection for TPU.

Three-level hierarchical sweep per ray tile: a while-loop over
SUPER-clusters (union AABBs of SUPER=16 consecutive clusters, scalar boxes
in SMEM at dynamic sublane indices — supported) slab-tests each super box
vectorized against the tile; only when some ray enters does an inner
fori_loop visit its child clusters; a touched cluster's 128-triangle slice
is then tested in SUBS sub-blocks, each gated by its own AABB (stored in
the slice's spare rows 14-19 and read as static-lane scalars), so an
incoherent tile pays only for the SUB_TRIS-sized Baldwin–Weber batches it
actually needs. No gathers, no dynamic lane indexing anywhere.

The sweep body (`cluster_sweep`) is shared by two consumers:
- the standalone `cluster_intersect` pallas_call (closest-hit / any-hit),
- the path-tracing megakernel (ops/pallas/pt_kernel.py), which passes a
  `KernelClusters` view of the same tables so the WHOLE bounce loop runs
  in-kernel for mesh scenes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_engine_tpu.accel.clusters import CLUSTER, SUBS, SUPER, ClusterSet

SUB_TRIS = CLUSTER // SUBS
_INF = np.float32(np.inf)


@dataclasses.dataclass(frozen=True)
class KernelClusters:
    """In-kernel view of a ClusterSet: Pallas refs + static metadata.

    The wavefront trace core accepts this in place of a ClusterSet so its
    cluster intersection runs *inside* an enclosing Pallas kernel (where a
    nested pallas_call is impossible and HBM gathers don't exist).
    """
    order_ref: Any    # SMEM (S,) int32 — super-cluster visit order
    sboxes_ref: Any   # SMEM (S, 8) f32 — super boxes
    boxes_ref: Any    # SMEM (C, 8) f32 — cluster boxes
    tri_ref: Any      # VMEM (ROWS, T_pad) f32 — triangle rows (14-19: sub-boxes)
    n_super: int
    # True only when compiling for real hardware: any-hit sweeps then use
    # the fast approximate reciprocal (~2^-14 t error — fine for binary
    # occlusion, bounded by tests_tpu). Interpret mode keeps exact math so
    # the CPU suite's any-hit == closest-hit invariants stay bitwise.
    approx_ok: bool = False
    # Optional per-tile visit-order selection (closest-hit sweeps only):
    # orders_ref (K, S) int32 SMEM — near-to-far order per reference
    # origin; refs_ref (K, 4) f32 SMEM — the reference origins (row 0 =
    # this frame's camera, rows 1+ = mesh farthest-point samples). The
    # sweep picks the row whose reference is nearest the tile's mean live
    # ray origin: primary tiles naturally select the camera row, bounce
    # tiles a mesh-local one (instrumented −18% tests on the config-3
    # bounce-1 sweep). Results stay order-independent by construction.
    orders_ref: Any = None
    refs_ref: Any = None
    n_orders: int = 0
    # Row-group-gated test issue: split each tile into `groups` row groups
    # (tile_h must divide; (8,128) groups = one f32 vreg) and run the
    # whole sweep per group, so a sub-block's triangle batch issues only
    # over groups containing a gating lane. Bit-exact: skipped groups had
    # sub_hit all-false, so every skipped test would have failed its `ok`
    # gate anyway. MEASURED NEGATIVE on chip (config 3 @512², 32×128
    # tile): 163.7 ms at groups=1 → 185.4 at 2 → 246.9 at 4, despite the
    # replayed lane-issue model predicting ~2x less test issue at
    # groups=4 (benchmarks/experiment_subgroups.py). The duplicated
    # scalar hierarchy traversal + per-group lax.cond branches cost more
    # than the saved lane issue. Kept (default 1 = zero impact) as the
    # committed, runnable record of the ruled-out lever.
    groups: int = 1


def _slab_vals(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
               ox, oy, oz, ix, iy, iz):
    """Vector slab test of a scalar box against the ray tile."""
    tx0 = (bminx - ox) * ix
    tx1 = (bmaxx - ox) * ix
    ty0 = (bminy - oy) * iy
    ty1 = (bmaxy - oy) * iy
    tz0 = (bminz - oz) * iz
    tz1 = (bmaxz - oz) * iz
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    return t_near, t_far


def _slab(box_ref, c, ox, oy, oz, ix, iy, iz):
    """Slab test of SMEM box row `box_ref[c]` against the ray tile."""
    return _slab_vals(box_ref[c, 0], box_ref[c, 1], box_ref[c, 2],
                      box_ref[c, 3], box_ref[c, 4], box_ref[c, 5],
                      ox, oy, oz, ix, iy, iz)


def cluster_sweep(kc: KernelClusters, o, d, t0, *, t_min, any_hit=False,
                  attrs=False):
    """Hierarchical closest-/any-hit sweep. Returns (t, idx_f32, attr).

    o, d: ray component planes; t0: initial best-t plane (doubles as t_max).
    idx < 0 means miss (t is then left at whatever the carry held — mask on
    idx, not t). attr = (nx, ny, nz, mat, 2*area) planes when attrs else ().
    Results are visit-order independent; order is a near-to-far perf hint.

    kc.groups > 1 runs the WHOLE sweep independently per row group of the
    tile ((8,128) groups = one f32 vreg): each group gates supers /
    clusters / sub-blocks against only ITS rays, so a cluster needed by
    one group's rays is never even slab-tested by the others, and a test
    batch issues over 1/groups of the lanes. Bit-exact: per-lane
    arithmetic is unchanged; skipped work would have failed its gates.
    Measured negative on chip — see the KernelClusters.groups comment;
    default 1 keeps the single-sweep path byte-for-byte unchanged.
    """
    G = kc.groups
    h = o[0].shape[0]
    if G > 1 and h % G == 0:
        gh = h // G
        t0 = jnp.broadcast_to(t0, o[0].shape).astype(jnp.float32)
        parts = []
        for g in range(G):
            sl = slice(g * gh, (g + 1) * gh)
            parts.append(_sweep_one(
                kc, tuple(x[sl] for x in o), tuple(x[sl] for x in d),
                t0[sl], t_min=t_min, any_hit=any_hit, attrs=attrs))
        t = jnp.concatenate([p[0] for p in parts], axis=0)
        idx = jnp.concatenate([p[1] for p in parts], axis=0)
        attr = tuple(jnp.concatenate([p[2][i] for p in parts], axis=0)
                     for i in range(len(parts[0][2])))
        return t, idx, attr
    return _sweep_one(kc, o, d, t0, t_min=t_min, any_hit=any_hit,
                      attrs=attrs)


def _sweep_one(kc: KernelClusters, o, d, t0, *, t_min, any_hit, attrs):
    """One full hierarchical sweep over the given ray planes (a whole tile
    or one row group of it — see cluster_sweep)."""
    ox, oy, oz = o
    dx, dy, dz = d
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    t0 = jnp.broadcast_to(t0, ox.shape).astype(jnp.float32)
    idx0 = jnp.zeros_like(t0) - 1.0  # f32 idx carry (no i1/i32 vector carries)
    if any_hit:
        # Parked lanes (the wavefront core pushes dead / non-candidate ray
        # origins to ~1e18) count as already-satisfied (idx=0): their slab
        # tests all fail anyway, but seeding them lets `live` clear — a
        # tile whose real candidates are all blocked early-exits the sweep
        # instead of visiting every remaining super-cluster. Callers gate
        # occlusion by their own candidate mask, so the fake idx is inert.
        idx0 = jnp.where(jnp.abs(ox) >= 1e17, 0.0, idx0)
    zero = jnp.zeros_like(t0)
    attr0 = (zero, zero, zero, zero, zero) if attrs else ()

    def mt_sub(blk, lo, c, sub, ray_hit, t, idx, attr, d3):
        """SUB_TRIS unrolled Baldwin–Weber tests against one gate block of
        cluster c's already-loaded (ROWS, 128) slice. The precomputed
        transform (accel/clusters.py row map) needs no cross products per
        test — ~30% fewer VPU ops than Möller-Trumbore — and the plane
        normal / material / area attrs are direct row reads. `lo` is the
        ray origin rebased to the cluster's local frame (translation
        invariance; see the row-map comment). `d3` is the ray direction
        (possibly a row-group slice of the tile — see kc.groups)."""
        dx, dy, dz = d3
        lox, loy, loz = lo
        if attrs:
            anx, any_, anz, amat, aarea = attr
        for k in range(sub * SUB_TRIS, (sub + 1) * SUB_TRIS):
            nx, ny, nz, nd = blk[0, k], blk[1, k], blk[2, k], blk[3, k]
            den = nx * dx + ny * dy + nz * dz
            num = nx * lox + ny * loy + nz * loz + nd
            # No den==0 guard needed: IEEE semantics make every degenerate
            # case a miss. Real triangle, parallel ray (den=0, num!=0):
            # tt = -/+inf fails tt>t_min or tt<t. All-zero padding rows
            # (den=num=0): tt = NaN (exact 1/0=inf, 0*inf) or -0 (approx),
            # and NaN comparisons are false / -0 fails tt>t_min.
            # Shadow sweeps (any_hit) use the fast approximate reciprocal
            # on hardware: binary occlusion tolerates the ~2^-14 relative
            # t error (kc.approx_ok is False in interpret mode).
            inv = pl.reciprocal(den, approx=any_hit and kc.approx_ok)
            tt = -num * inv
            px = lox + tt * dx  # cluster-local hit point
            py = loy + tt * dy
            pz = loz + tt * dz
            u = blk[4, k] * px + blk[5, k] * py + blk[6, k] * pz + blk[7, k]
            v = blk[8, k] * px + blk[9, k] * py + blk[10, k] * pz + blk[11, k]
            ok = (
                ray_hit
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (tt > t_min) & (tt < t)
            )
            t = jnp.where(ok, tt, t)
            idx = jnp.where(ok, jnp.float32(1.0) * (c * CLUSTER + k), idx)
            if attrs:
                anx = jnp.where(ok, nx, anx)
                any_ = jnp.where(ok, ny, any_)
                anz = jnp.where(ok, nz, anz)
                amat = jnp.where(ok, blk[12, k], amat)
                aarea = jnp.where(ok, blk[13, k], aarea)
        if attrs:
            attr = (anx, any_, anz, amat, aarea)
        return t, idx, attr

    def mt_cluster(c, ray_hit, t, idx, attr):
        """Cluster c's triangle tests, gated per SUB_TRIS-triangle sub-box:
        incoherent tiles usually need only a couple of the SUBS blocks.
        Sub-boxes live in tri rows 14-19 at (static) lane `sub` of the
        already-loaded block."""
        base = pl.multiple_of(c * CLUSTER, CLUSTER)
        blk = kc.tri_ref[:, pl.ds(base, CLUSTER)]  # (ROWS, 128), lane-aligned
        # rebase the ray origin to the cluster's local frame once per
        # cluster (translation-invariant affine rows, see accel/clusters)
        lo = (ox - blk[20, 0], oy - blk[20, 1], oz - blk[20, 2])
        for sub in range(SUBS):
            t_near, t_far = _slab_vals(
                blk[14, sub], blk[15, sub], blk[16, sub],
                blk[17, sub], blk[18, sub], blk[19, sub],
                ox, oy, oz, inv_dx, inv_dy, inv_dz)
            sub_hit = ray_hit & (t_near <= t_far) & (t_far > t_min) & (t_near < t)

            def hit_fn(a, _sub=sub, _sh=sub_hit):
                t, idx, attr = a[0], a[1], a[2:]
                t, idx, attr = mt_sub(blk, lo, c, _sub, _sh, t, idx, attr,
                                      (dx, dy, dz))
                return (t, idx) + attr

            t, idx, *attr = lax.cond(jnp.any(sub_hit), hit_fn, lambda a: a,
                                     (t, idx) + tuple(attr))
            attr = tuple(attr)
        return t, idx, attr

    def child(k, args, *, s):
        t, idx, attr = args[0], args[1], args[2:]
        c = s * SUPER + k
        t_near, t_far = _slab(kc.boxes_ref, c, ox, oy, oz,
                              inv_dx, inv_dy, inv_dz)
        ray_hit = (t_near <= t_far) & (t_far > t_min) & (t_near < t)
        if any_hit:
            ray_hit = ray_hit & (idx < 0.0)

        def hit_fn(a):
            t, idx, attr = a[0], a[1], a[2:]
            t, idx, attr = mt_cluster(c, ray_hit, t, idx, attr)
            return (t, idx) + attr

        return lax.cond(jnp.any(ray_hit), hit_fn, lambda a: a,
                        (t, idx) + attr)

    # per-tile visit-order selection (closest sweeps): pick the
    # precomputed order whose reference origin is nearest the tile's mean
    # live ray origin — a handful of scalar ops + 4 plane reductions
    order_k = None
    if kc.n_orders and not any_hit:
        live_m = (jnp.abs(ox) < 1e17).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(live_m), 1.0)
        mx = jnp.sum(ox * live_m) / cnt
        my = jnp.sum(oy * live_m) / cnt
        mz = jnp.sum(oz * live_m) / cnt
        best_d = jnp.float32(_INF)
        order_k = jnp.int32(0)
        for k in range(kc.n_orders):
            ddx = kc.refs_ref[k, 0] - mx
            ddy = kc.refs_ref[k, 1] - my
            ddz = kc.refs_ref[k, 2] - mz
            d2 = ddx * ddx + ddy * ddy + ddz * ddz
            sel = d2 < best_d
            best_d = jnp.where(sel, d2, best_d)
            order_k = jnp.where(sel, jnp.int32(k), order_k)

    def cond(state):
        si, t, idx, live = state[0], state[1], state[2], state[3]
        return (si < kc.n_super) & (live != 0.0)

    def body(state):
        si, t, idx, live, attr = (state[0], state[1], state[2], state[3],
                                  state[4:])
        if order_k is None:
            s = kc.order_ref[si]  # near-to-far visit order (perf hint only)
        else:
            s = kc.orders_ref[order_k, si]
        t_near, t_far = _slab(kc.sboxes_ref, s, ox, oy, oz,
                              inv_dx, inv_dy, inv_dz)
        super_hit = (t_near <= t_far) & (t_far > t_min) & (t_near < t)
        if any_hit:
            super_hit = super_hit & (idx < 0.0)

        t, idx, *attr = lax.cond(
            jnp.any(super_hit),
            lambda a: lax.fori_loop(0, SUPER, functools.partial(child, s=s), a),
            lambda a: a,
            (t, idx) + tuple(attr),
        )
        if any_hit:
            live = jnp.where(jnp.any(idx < 0.0), 1.0, 0.0)
        return (si + 1, t, idx, live) + tuple(attr)

    state = lax.while_loop(
        cond, body, (jnp.int32(0), t0, idx0, jnp.float32(1.0)) + attr0
    )
    t, idx, attr = state[1], state[2], state[4:]
    return t, idx, attr


def _cluster_kernel(order_ref, sboxes_ref, boxes_ref, tri_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmax_ref, *rest, n_super, t_min, any_hit, attrs,
                    approx_ok=False, n_orders=0, groups=1):
    orders_ref = refs_ref = None
    if n_orders:
        orders_ref, refs_ref, *out_refs = rest
    else:
        out_refs = rest
    if attrs:
        (out_t_ref, out_idx_ref, out_nx_ref, out_ny_ref, out_nz_ref,
         out_mat_ref, out_area_ref) = out_refs
    else:
        out_t_ref, out_idx_ref = out_refs
    kc = KernelClusters(order_ref, sboxes_ref, boxes_ref, tri_ref, n_super,
                        approx_ok=approx_ok, orders_ref=orders_ref,
                        refs_ref=refs_ref, n_orders=n_orders, groups=groups)
    t, idx, attr = cluster_sweep(
        kc,
        (ox_ref[:], oy_ref[:], oz_ref[:]),
        (dx_ref[:], dy_ref[:], dz_ref[:]),
        tmax_ref[:], t_min=t_min, any_hit=any_hit, attrs=attrs,
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
    static_argnames=("t_min", "any_hit", "tile", "interpret", "attrs",
                     "groups"),
)
def cluster_intersect(cs: ClusterSet, o_planes, d_planes, t_max,
                      t_min=1e-3, any_hit=False, tile=(16, 256),
                      interpret=None, attrs=False, order=None,
                      orders=None, refs=None, groups=1):
    """Intersect an (H, W) ray-plane grid against a ClusterSet.

    Returns (t (H,W) — inf on miss, tri_idx (H,W) int32 — PADDED-REORDERED
    slot, -1 on miss; map back with cs.perm).

    attrs=True additionally returns (nx, ny, nz, mat, area): unnormalized
    geometric normal (e1 x e2), material id (f32, from tri row 12) and
    triangle area of the hit — selected in-kernel, so callers need no
    post-kernel gathers.

    order: optional (S,) int32 SUPER-cluster visit order
    (accel.clusters.visit_order) — near-to-far ordering lets the running t
    cull far boxes; pure perf hint, results are order-independent.

    orders/refs: optional (K, S) int32 visit-order table + (K, 4) f32
    reference origins (accel.clusters.visit_orders) — each TILE then picks
    the order whose reference is nearest its mean live ray origin (same
    mechanism as the megakernel's per-tile orders; closest-hit sweeps
    only). Overrides `order`. Pure perf hint; results order-independent.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = o_planes[0].shape
    from raytracing_engine_tpu.ops.pallas.common import pick_tile

    tile_h, tile_w = pick_tile(h, w, *tile)
    grid = (h // tile_h, w // tile_w)

    n_orders = 0
    if orders is not None and not any_hit:
        n_orders = orders.shape[0]
    kernel = functools.partial(
        _cluster_kernel,
        n_super=cs.num_super,
        t_min=t_min,
        any_hit=any_hit,
        attrs=attrs,
        approx_ok=not interpret,
        n_orders=n_orders,
        groups=groups,
    )
    blk = lambda: pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
    if order is None:
        order = jnp.arange(cs.num_super, dtype=jnp.int32)
    f32 = lambda: jax.ShapeDtypeStruct((h, w), jnp.float32)
    out_shape = [f32(), jax.ShapeDtypeStruct((h, w), jnp.int32)]
    if attrs:
        out_shape += [f32(), f32(), f32(), f32(), f32()]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # super visit order
        pl.BlockSpec(memory_space=pltpu.SMEM),   # super boxes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster boxes
        pl.BlockSpec(memory_space=pltpu.VMEM),   # tri rows (ROWS, T_pad)
        blk(), blk(), blk(), blk(), blk(), blk(), blk(),
    ]
    args = [order, cs.super_boxes, cs.boxes, cs.tri,
            o_planes[0], o_planes[1], o_planes[2],
            d_planes[0], d_planes[1], d_planes[2],
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (h, w))]
    if n_orders:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),   # order table
                     pl.BlockSpec(memory_space=pltpu.SMEM)]   # refs
        args += [orders, refs]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(blk() for _ in out_shape),
        interpret=interpret,
    )(*args)
    return outs if attrs else (outs[0], outs[1])

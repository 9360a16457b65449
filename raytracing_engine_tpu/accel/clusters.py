"""Cluster-binned triangle layout — the TPU-native acceleration structure.

Pointer-chasing BVH traversal needs per-step scalar loads at DYNAMIC lane
indices, which Mosaic cannot lower from VMEM. The TPU-shaped alternative:
take the BVH's spatially-coherent leaf ordering, cut it into clusters of
exactly ``CLUSTER`` (=128, one lane row) consecutive triangles, and
intersect by (a) culling cluster AABBs (scalar boxes in SMEM, vector slab
tests) and (b) vector Möller-Trumbore over a whole lane-aligned cluster
slice when any ray in the tile touches its box. Every memory access is
either an SMEM scalar at a dynamic SUBLANE index or a VMEM vector load at a
provably 128-aligned lane offset — exactly what the hardware does well.

O(C) cluster tests per tile instead of O(log N) pointer hops — but each
test is one dense VPU op over the tile, and C = T/128 stays small (550 for
a 70k mesh).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.accel.bvh import BVH, build_bvh

CLUSTER = 128  # one full lane row per cluster
SUPER = 16     # clusters per super-cluster (hierarchical cull level)
SUBS = 8       # sub-boxes per cluster (16-triangle Möller-Trumbore gates; 4 and 16 measured slower on v5e)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ClusterSet:
    tri: jax.Array       # (16, T_pad) f32 — rows [v0.xyz, e1.xyz, e2.xyz, mat, pad]
    boxes: jax.Array     # (C, 8) f32 — [minx,miny,minz,maxx,maxy,maxz,pad,pad];
                         #   C is a SUPER multiple (tail = inverted never-hit)
    perm: jax.Array      # (T_pad,) int32 — padded-slot -> original tri (-1 pad)
    centroid: jax.Array  # (C, 3) f32 — box centers
    super_boxes: jax.Array     # (C/SUPER, 8) f32 — union AABB of SUPER children
    super_centroid: jax.Array  # (C/SUPER, 3) f32 — for per-frame visit order

    @property
    def num_clusters(self) -> int:
        return self.boxes.shape[0]

    @property
    def num_super(self) -> int:
        return self.super_boxes.shape[0]

    @property
    def padded_tris(self) -> int:
        return self.tri.shape[1]


def build_clusters(triangles: np.ndarray, bvh: BVH | None = None,
                   tri_mats: np.ndarray | None = None) -> ClusterSet:
    """triangles: (T, 3, 3). Uses the BVH leaf order for spatial coherence
    (builds one if not given), pads to a CLUSTER multiple with degenerate
    triangles (det=0 -> never hit) inside inverted never-hit boxes.
    tri_mats: optional (T,) material ids, stored in tri row 9 so the
    intersector can emit materials without a post-kernel gather.

    Prefer bvh=None here on tunneled backends: fetching device-resident BVH
    arrays back to host has shown ~100 s stalls; the in-process build is
    ~0.2 s for 70k triangles."""
    tris = np.asarray(triangles, np.float32)
    T = tris.shape[0]
    if bvh is None:
        bvh = build_bvh(tris)
    perm = np.asarray(bvh.perm)
    ordered = tris[perm]

    # pad the cluster count to a SUPER multiple (tail clusters are inverted
    # never-hit boxes) so the hierarchical sweep's inner loop is rectangular
    T_pad = -(-T // (CLUSTER * SUPER)) * (CLUSTER * SUPER)
    v0 = np.zeros((T_pad, 3), np.float32)
    e1 = np.zeros((T_pad, 3), np.float32)
    e2 = np.zeros((T_pad, 3), np.float32)
    v0[:T] = ordered[:, 0]
    e1[:T] = ordered[:, 1] - ordered[:, 0]
    e2[:T] = ordered[:, 2] - ordered[:, 0]
    perm_pad = np.full((T_pad,), -1, np.int32)
    perm_pad[:T] = perm

    # Padding boxes are ALL-NaN: the swap-based slab test (min/max per
    # axis) lets an inverted (+inf/-inf) box pass for EVERY ray (t_near=-inf,
    # t_far=+inf), whereas NaN propagates and every comparison is false —
    # a genuine never-hit that costs one failed gate instead of a full
    # degenerate MT sweep.
    C = T_pad // CLUSTER
    boxes = np.zeros((C, 8), np.float32)
    for c in range(C):
        lo = c * CLUSTER
        hi = min((c + 1) * CLUSTER, T)
        if lo >= T:
            boxes[c, :6] = np.nan
            continue
        chunk = ordered[lo:hi].reshape(-1, 3)
        boxes[c, :3] = chunk.min(0)
        boxes[c, 3:6] = chunk.max(0)

    # sub-boxes (16-tri MT gates) — packed into tri rows 10-15 at lanes
    # 0..SUBS-1 of each cluster's slice, NOT into SMEM: SMEM scalars cost
    # 64 B each on v5e (a (C*SUBS, 8) table would blow the 1 MB budget),
    # while rows 10-15 of the (16, T_pad) VMEM table are free padding and
    # the kernel reads them as static-lane scalars from the block it
    # already loaded.
    sub = CLUSTER // SUBS
    sub_boxes = np.zeros((C * SUBS, 6), np.float32)
    for s in range(C * SUBS):
        lo = s * sub
        hi = min((s + 1) * sub, T)
        if lo >= T:
            sub_boxes[s, :6] = np.nan  # never-hit (see boxes comment)
            continue
        chunk = ordered[lo:hi].reshape(-1, 3)
        sub_boxes[s, :3] = chunk.min(0)
        sub_boxes[s, 3:6] = chunk.max(0)

    with np.errstate(invalid="ignore"):  # NaN on padded boxes
        centroid = (boxes[:, :3] + boxes[:, 3:6]) * 0.5
    centroid[~np.isfinite(centroid)] = 1e30  # padded never-hit clusters last

    # super-cluster union boxes: nanmin/nanmax ignore padded (NaN) children;
    # an all-padded super stays all-NaN = never hit
    S = T_pad // (CLUSTER * SUPER)
    sb = boxes.reshape(S, SUPER, 8)
    super_boxes = np.zeros((S, 8), np.float32)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
        super_boxes[:, :3] = np.nanmin(sb[:, :, :3], 1)
        super_boxes[:, 3:6] = np.nanmax(sb[:, :, 3:6], 1)
    with np.errstate(invalid="ignore"):
        super_centroid = (super_boxes[:, :3] + super_boxes[:, 3:6]) * 0.5
    super_centroid[~np.isfinite(super_centroid)] = 1e30

    tri_rows = np.zeros((16, T_pad), np.float32)
    tri_rows[0:3] = v0.T
    tri_rows[3:6] = e1.T
    tri_rows[6:9] = e2.T
    if tri_mats is not None:
        mats = np.asarray(tri_mats, np.float32)[perm]
        tri_rows[9, :T] = mats
    # rows 10-15 = sub-box [minx,miny,minz,maxx,maxy,maxz]; lane s of each
    # cluster's slice holds sub-block s's box
    for c in range(C):
        for s in range(SUBS):
            tri_rows[10:16, c * CLUSTER + s] = sub_boxes[c * SUBS + s]
    return ClusterSet(
        tri=jnp.asarray(tri_rows),
        boxes=jnp.asarray(boxes),
        perm=jnp.asarray(perm_pad),
        centroid=jnp.asarray(centroid),
        super_boxes=jnp.asarray(super_boxes),
        super_centroid=jnp.asarray(super_centroid),
    )


def visit_order(cs: ClusterSet, origin):
    """Near-to-far SUPER-cluster visit order from a representative origin (3,).

    Ordering is a pure performance hint for the sweep: nearer clusters hit
    first shrink the running t, so farther boxes fail the (t_near < t) test
    and skip their triangle work entirely. Results are order-independent.
    """
    d = cs.super_centroid - jnp.asarray(origin, jnp.float32)
    return jnp.argsort(jnp.sum(d * d, axis=-1)).astype(jnp.int32)

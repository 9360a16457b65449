"""Row-group-gated test issue experiment for config 3 (offline, replay).

The regroup experiment (experiment_regroup.py) showed most of the config-3
frame is test batches issued over 4096-lane tiles that only a handful of
lanes need — but moving rays between tiles in XLA MEASURED SLOWER (the
plane gathers cost more than the sweep savings: fast-path 217 ms -> 286 ms
with the cumsum partition, 461 ms with octant buckets).

This models the TRANSPORT-FREE alternative: keep rays where they are, but
gate each hit sub-block's 32-triangle test batch per (8,128) row group of
the (32,128) tile — issue the batch only over row groups containing a
gating lane. Costs `groups` extra scalar branches per hit sub-block;
saves (groups - hit_groups)/groups of the batch's lane-ops.

Output: per-sweep modeled lane-ops at groups = 1/2/4, the implied frame
time at the fitted sustained rate, and the extra branch count.

Usage: python benchmarks/experiment_subgroups.py [--size 512]
(counting runs anywhere — no TPU needed; states come from one jit)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instrument_config3 import (  # noqa: E402
    OPS_SLAB,
    OPS_TEST,
    TILE,
    SweepStats,
    extract_states,
    replay_sweep,
)

LANES = TILE[0] * TILE[1]


def replay(bvh, s, any_hit, groups, t_min=1e-3, tile_order=True):
    from raytracing_engine_tpu.accel.clusters import CLUSTER, SUBS, SUPER

    tri = np.asarray(bvh.tri)
    boxes = np.asarray(bvh.boxes)
    sboxes = np.asarray(bvh.super_boxes)
    scent = np.asarray(bvh.super_centroid)

    o = s["o"].reshape(3, -1)
    d = s["d"].reshape(3, -1)
    t0 = (s["dist"].reshape(-1).astype(np.float32) if any_hit
          else np.full(o.shape[1], 3.4e38, np.float32))

    agg = SweepStats()
    n = o.shape[1]
    # pixel tiling: contiguous flattened chunks ARE the kernel's tiles
    # (states come in (H, W) row-major; tile_lanes order matches)
    from instrument_config3 import tile_lanes

    o_t = list(tile_lanes(s["o"], TILE))
    d_t = list(tile_lanes(s["d"], TILE))
    if any_hit:
        t0_t = list(tile_lanes(s["dist"].astype(np.float32), TILE))
    else:
        t0_t = [np.full(ot.shape[1], 3.4e38, np.float32) for ot in o_t]
    for i in range(len(o_t)):
        ot = o_t[i]
        if tile_order and not any_hit:
            live = np.abs(ot[0]) < 1e17
            nl = max(int(live.sum()), 1)
            mo = np.where(live[None], ot, 0.0).sum(axis=1) / nl
            order = np.argsort(((scent - mo) ** 2).sum(axis=1))
        else:
            order = np.argsort(((scent - np.zeros(3)) ** 2).sum(axis=1))
        st, _, _ = replay_sweep(tri, boxes, sboxes, order, ot, d_t[i],
                                t0_t[i], t_min, any_hit,
                                CLUSTER // SUBS, SUBS, CLUSTER, SUPER,
                                groups=groups)
        for f in SweepStats.FIELDS:
            setattr(agg, f, getattr(agg, f) + getattr(st, f))
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--groups", default="1,2,4")
    args = ap.parse_args()

    print("extracting per-bounce ray states...")
    mesh, bvh, scene, cfg, states = extract_states(args.size)
    gs = [int(g) for g in args.groups.split(",")]

    fit_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "instrument_config3.json")
    fit = json.load(open(fit_path)).get("fit") or {}
    ms_per_top = 1e3 / fit.get("sustained_top_s", 1.77)

    rows = {}
    totals = {g: 0.0 for g in gs}
    conds = {g: 0 for g in gs}
    for kind, b in [("ray", 0), ("shadow", 0), ("ray", 1), ("shadow", 1),
                    ("ray", 2), ("shadow", 2)]:
        if b not in states[kind]:
            continue
        any_hit = kind == "shadow"
        name = f"{'shadow' if any_hit else 'closest'}_b{b}"
        for g in gs:
            st = replay(bvh, states[kind][b], any_hit, g)
            slabs = st.supers_gated + st.clusters_gated + st.subs_gated
            ops = st.lane_issue * OPS_TEST + slabs * OPS_SLAB * LANES
            ms = ops / 1e12 * ms_per_top
            totals[g] += ms
            conds[g] += st.group_conds
            rows[f"{name}:g{g}"] = {
                "lane_issue": int(st.lane_issue), "lane_ops": int(ops),
                "model_ms": round(ms, 2), "group_conds": int(st.group_conds)}
            print(f"{name:12s} groups={g}  issue={st.lane_issue/1e6:8.1f}M "
                  f"ops={ops/1e9:7.1f}G  ~{ms:6.2f} ms  "
                  f"conds={st.group_conds}")
    for g in gs:
        print(f"TOTAL groups={g}: ~{totals[g]:.1f} ms modeled sweep "
              f"(+{conds[g]} extra branches)")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "experiment_subgroups.json")
    with open(out, "w") as f:
        json.dump({"size": args.size, "fit_ms_per_top": ms_per_top,
                   "rows": rows,
                   "totals_ms": {str(g): round(totals[g], 1) for g in gs}},
                  f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Cross-tile ray-regrouping experiment for config 3 (offline, replay-based).

The roofline fit (instrument_config3.py) shows 96% of the 162 ms config-3
frame is counted sweep arithmetic at the kernel's own sustained rate — so
the only way forward is to ISSUE FEWER TESTS. Occupancy says how: bounce
sweeps run at ~0.1% useful-lane occupancy because a (32,128) tile's 4096
diffuse rays collectively touch ~16% of all sub-blocks while each ray
needs only a handful.

This script measures — WITHOUT building a kernel — how much test issue
shrinks if rays are regrouped frame-wide between bounces so that rays in
one tile share locality. It replays the exact per-bounce ray states
through the same NumPy gate/test model, but with lanes assigned to tiles
by a sort key instead of by pixel position:

  morton      Morton code of the quantized ray origin (position locality)
  morton+oct  Morton(origin) high bits, direction octant low bits
  oct+morton  direction octant high bits, Morton(origin) low bits
  cluster     id of the nearest cluster centroid to the origin (cheap
              kernel-side analog: the cluster that produced the hit)

Dead/parked rays (|o| >= 1e17) sort to the end and compact into
all-dead tiles (which a kernel skips outright; counted as zero work).

Output: per-sweep issued-test counts under each grouping vs the current
pixel tiling, the modeled ms at the fitted sustained rate, and the net
frame prediction including a regroup-overhead allowance.

Usage: python benchmarks/experiment_regroup.py [--size 512] [--quick]
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
DEAD = 1e17


def _morton3(q):
    """Interleave 3x10-bit -> 30-bit Morton. q: (N, 3) uint32 in [0,1024)."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def make_keys(o, d, live, lo, hi, scent, mode):
    """Sort key per ray (N,). Dead rays get the max key."""
    n = o.shape[1]
    span = np.maximum(hi - lo, 1e-6)
    q = np.clip(((o.T - lo) / span * 1023.0), 0, 1023).astype(np.uint32)
    m = _morton3(q)  # (N,) uint64, 30 bits
    oct_ = ((d[0] > 0).astype(np.uint64)
            | ((d[1] > 0).astype(np.uint64) << np.uint64(1))
            | ((d[2] > 0).astype(np.uint64) << np.uint64(2)))
    if mode == "morton":
        key = m
    elif mode == "morton+oct":
        key = (m << np.uint64(3)) | oct_
    elif mode == "oct+morton":
        key = (oct_ << np.uint64(30)) | m
    elif mode == "cluster":
        # nearest cluster centroid to the origin; octant low bits
        d2 = ((o.T[:, None, :] - scent[None]) ** 2).sum(-1)  # (N, C)
        key = (d2.argmin(1).astype(np.uint64) << np.uint64(3)) | oct_
    elif mode == "compact":
        # ORDER-PRESERVING alive partition: the cheap kernel-side regroup
        # (one cumsum + one gather — no argsort). Alive rays keep pixel
        # order, dead rays compact to all-dead tiles at the end.
        key = np.zeros(n, np.uint64)
    elif mode == "compact+oct":
        # alive partition sub-bucketed by direction octant (8 stable
        # partitions = 8 cumsums kernel-side); pixel order within buckets
        key = oct_
    else:
        raise ValueError(mode)
    return np.where(live, key, np.uint64(1) << np.uint64(62))


def replay_grouped(bvh, s, any_hit, mode, t_min=1e-3, key_state=None):
    """Replay one sweep with frame-wide regrouped lanes. Returns stats.

    key_state: optional state dict whose rays define the sort key (the
    per-bounce launch permutes by the BOUNCE ray set; its NEE shadow sweep
    inherits that permutation, so shadow replays pass the ray state here).
    """
    from raytracing_engine_tpu.accel.clusters import CLUSTER, SUBS, SUPER

    tri = np.asarray(bvh.tri)
    boxes = np.asarray(bvh.boxes)
    sboxes = np.asarray(bvh.super_boxes)
    scent = np.asarray(bvh.super_centroid)
    ccent = np.asarray(bvh.centroid) if hasattr(bvh, "centroid") else scent

    o = s["o"].reshape(3, -1)
    d = s["d"].reshape(3, -1)
    t0 = (s["dist"].reshape(-1).astype(np.float32) if any_hit
          else np.full(o.shape[1], 3.4e38, np.float32))
    live = np.abs(o[0]) < DEAD

    if mode == "pixel":
        perm = np.arange(o.shape[1])
    else:
        ks = key_state if key_state is not None else s
        ko = ks["o"].reshape(3, -1)
        kd = ks["d"].reshape(3, -1)
        klive = np.abs(ko[0]) < DEAD
        lo = ko.T[klive].min(0) if klive.any() else np.zeros(3)
        hi = ko.T[klive].max(0) if klive.any() else np.ones(3)
        key = make_keys(ko, kd, klive, lo, hi, ccent, mode)
        perm = np.argsort(key, kind="stable")
    o, d, t0, live = o[:, perm], d[:, perm], t0[perm], live[perm]

    agg = SweepStats()
    n = o.shape[1]
    dead_tiles = 0
    for i in range(0, n, LANES):
        sl = slice(i, i + LANES)
        if not live[sl].any():
            dead_tiles += 1
            continue  # kernel skips an all-dead tile via its lane count
        ot = o[:, sl]
        mo = (np.where(live[None, sl], ot, 0.0).sum(1)
              / max(int(live[sl].sum()), 1))
        order = np.argsort(((scent - mo) ** 2).sum(1))
        st, _, _ = replay_sweep(tri, boxes, sboxes, order, ot, d[:, sl],
                                t0[sl], t_min, any_hit,
                                CLUSTER // SUBS, SUBS, CLUSTER, SUPER)
        for f in SweepStats.FIELDS:
            setattr(agg, f, getattr(agg, f) + getattr(st, f))
    agg.scale = 1
    agg.dead_tiles = dead_tiles
    return agg


def lane_ops(st):
    slabs = st.supers_gated + st.clusters_gated + st.subs_gated
    return (st.tests * OPS_TEST + slabs * OPS_SLAB) * LANES


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--modes", default="pixel,morton,morton+oct,oct+morton")
    ap.add_argument("--sweeps", default="ray1,ray2,shadow0,shadow1,shadow2")
    args = ap.parse_args()

    print("extracting per-bounce ray states...")
    mesh, bvh, scene, cfg, states = extract_states(args.size)
    modes = args.modes.split(",")
    want = args.sweeps.split(",")

    # fitted roofline constants (benchmarks/instrument_config3.json)
    fit_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "instrument_config3.json")
    fit = json.load(open(fit_path)).get("fit") or {}
    ms_per_top = 1e3 / fit.get("sustained_top_s", 1.77)

    rows = {}
    for name in want:
        kind = "shadow" if name.startswith("shadow") else "ray"
        b = int(name[-1])
        if b not in states[kind]:
            continue
        s = states[kind][b]
        any_hit = kind == "shadow"
        # the per-bounce launch permutes by ITS ray set; shadow sweeps of
        # bounce b inherit the permutation chosen for ray bounce b
        key_state = states["ray"][b] if any_hit else None
        base = None
        for mode in modes:
            st = replay_grouped(bvh, s, any_hit, mode, key_state=key_state)
            ops = lane_ops(st)
            ms = ops / 1e12 * ms_per_top
            if mode == "pixel":
                base = ops
            ratio = base / ops if base else float("nan")
            occ = (st.useful_lane_tests / (st.tests * LANES) * 100
                   if st.tests else 0.0)
            rows[f"{name}:{mode}"] = {
                "tests": int(st.tests), "lane_ops": int(ops),
                "model_ms": round(ms, 2), "occupancy_pct": round(occ, 2),
                "speedup_vs_pixel": round(ratio, 2),
                "dead_tiles": int(getattr(st, "dead_tiles", 0))}
            print(f"{name:10s} {mode:11s} tests={st.tests:8d} "
                  f"ops={ops/1e9:7.1f}G  ~{ms:6.2f} ms  occ={occ:5.2f}%  "
                  f"x{ratio:4.2f}  dead_tiles={getattr(st, 'dead_tiles', 0)}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "experiment_regroup.json")
    with open(out, "w") as f:
        json.dump({"size": args.size, "fit_ms_per_top": ms_per_top,
                   "rows": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

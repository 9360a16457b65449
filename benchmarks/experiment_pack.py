"""Cluster-packing A/B on the config-3 bench ray states (chip-free).

Replays the exact per-bounce ray/shadow states of the bench frame (cached
by instrument_config3.py; tree-INDEPENDENT — the states are geometry hits,
not traversal artifacts) through cluster sets built with different
(BVH partitioner, subtree-descend depth) combos, and prices each with the
production lane-ops model (closest sweeps use per-tile visit orders,
any-hit keeps the camera order — same accounting as the committed roofline
fit). Lane-ops at the fitted sustained rate IS frame time, so this ranks
packing choices without touching the chip.

Usage: python benchmarks/experiment_pack.py [--size 512] [--quick]
Needs /tmp/config3_states_<size>_sah.npz (run instrument_config3.py once).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instrument_config3 import OPS_SLAB, OPS_TEST, TILE, replay_frame  # noqa: E402


def load_states(size):
    for tag in ("sah", "median", ""):
        cache = f"/tmp/config3_states_{size}_{tag}.npz" if tag else \
            f"/tmp/config3_states_{size}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            states = {"ray": {}, "shadow": {}}
            for k in z.files:
                kind, b, name = k.split("|")
                states[kind].setdefault(int(b), {})[name] = z[k]
            return states
    raise SystemExit("no cached states; run instrument_config3.py first")


PROD = ["closest_b0@tile", "shadow_b0", "closest_b1@tile", "shadow_b1",
        "closest_b2@tile", "shadow_b2"]


def price(sweeps):
    lanes = TILE[0] * TILE[1]
    total = 0
    for name in PROD:
        st = sweeps[name]
        scale = getattr(st, "scale", 1)
        slabs = st.supers_gated + st.clusters_gated + st.subs_gated
        total += (st.tests * OPS_TEST + slabs * OPS_SLAB) * scale * lanes
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from run_all import config3_scene
    from raytracing_engine_tpu.accel import build_bvh
    from raytracing_engine_tpu.accel.clusters import CLUSTER, build_clusters

    states = load_states(args.size)
    mesh, _, scene, cfg, _ = config3_scene(size=args.size)
    mats = np.zeros(mesh.shape[0], np.int32)

    combos = [("median", None, None), ("sah", None, None),
              ("sah", CLUSTER * 3 // 4, None), ("sah", CLUSTER, None),
              ("sah", CLUSTER // 4, None),
              ("sah", None, 0.25), ("sah", None, 0.1), ("sah", None, 0.5),
              ("median", None, 0.25)]
    out = {}
    for method, descend, dp_kc in combos:
        bvh = build_bvh(mesh, method=method)
        if dp_kc is not None:
            cs = build_clusters(mesh, bvh=bvh, tri_mats=mats, align="dp",
                                dp_kc=dp_kc)
            key = f"{method}/dp_kc={dp_kc}"
        else:
            cs = build_clusters(mesh, bvh=bvh, tri_mats=mats,
                                descend=descend)
            key = f"{method}/descend={descend or 'half'}"
        fill = float((np.asarray(cs.perm) >= 0).mean())
        sweeps, _ = replay_frame(cs, states, cfg, cfg.t_min, quick=args.quick)
        ops = price(sweeps)
        out[key] = {"clusters": cs.num_clusters, "fill": round(fill, 3),
                    "glane_ops": round(ops / 1e9, 1)}
        print(f"{key:<24} clusters={cs.num_clusters:>4} fill={fill:.3f} "
              f"prod-ops={ops/1e9:.1f}G")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "experiment_pack.json")
    with open(path, "w") as f:
        json.dump({"size": args.size, "quick": args.quick,
                   "production_sweeps": PROD, "combos": out}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Config-3 work instrumentation + VPU roofline — a RUNNABLE artifact.

Round-2 claimed the mesh-PT cluster sweep was "near its arithmetic floor"
from instrumentation that was never committed. This script makes the claim
reproducible:

1. extracts the EXACT per-bounce ray states of the bench frame (the
   megakernel shares `_trace_core` with the XLA path and the pcg stream is
   keyed on global pixel coords, so the states are bit-identical to what
   the kernel traces);
2. replays the hierarchical sweep's gate/test logic per (32,128) kernel
   tile in NumPy, counting supers/clusters/sub-blocks touched and
   triangle tests issued — including the running-t shrink and the any-hit
   early exit, so counts match the kernel's control flow;
3. measures the achievable VPU f32 throughput with a Pallas FMA microbench
   (independent chains — throughput, not latency);
4. times the megakernel at max_bounces 0/1/2 x NEE on/off for measured
   marginal per-sweep costs;
5. prints a roofline table: modeled arithmetic ms per sweep vs measured,
   plus the lane-occupancy (useful-lane / issued-lane) of every sweep and
   the sub-block overlap between each NEE shadow sweep and the following
   bounce's closest sweep (the coupled-sweep sharing bound).

Usage:  python benchmarks/instrument_config3.py [--size 512] [--quick]
        (timings/microbench need the TPU; counting runs anywhere)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the state-extraction jit is compile-heavy; reuse the persistent cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

# vector-op model of the kernel (ops are per-lane elementary arithmetic;
# an FMA counts as one op, matching the microbench's op accounting)
OPS_TEST = 30      # Baldwin-Weber test: den/num/recip/tt/p/u/v/cmp/sel
OPS_SLAB = 28      # 6-plane slab test + min/max tree + compares
TILE = (32, 128)   # bench kernel tile (benchmarks/run_all.py config3)


# ---------------------------------------------------------------------------
# 1. ray-state extraction
# ---------------------------------------------------------------------------

def extract_states(size):
    """Per-bounce (closest-hit rays, NEE shadow rays) of the bench frame.

    The probe hook fires during tracing, so collecting the traced values
    and returning them from a jitted wrapper yields every state in ONE
    dispatch (eager execution over the tunneled runtime would pay ~ms per
    op across thousands of ops)."""
    import jax
    import jax.numpy as jnp

    from run_all import config3_scene
    from raytracing_engine_tpu.ops.pallas.rng import key_to_seed
    from raytracing_engine_tpu.pathtracer.wavefront import trace_pass_soa

    mesh, bvh, scene, cfg, _ = config3_scene(size=size)
    key = jax.random.PRNGKey(1)
    seed0 = key_to_seed(key)

    keys = []

    @jax.jit
    def collect(pos, quat):
        acc = []
        keys.clear()

        def probe(kind, b, d):
            keys.append((kind, b, tuple(d)))
            acc.append({k: (jnp.stack(v) if isinstance(v, tuple) else v)
                        for k, v in d.items()})

        trace_pass_soa(cfg, scene, pos, quat, None, bvh=bvh, seed0=seed0,
                       probe=probe)
        return acc

    out = jax.device_get(collect(jnp.array([0.0, 0.0, 0.0]),
                                 jnp.array([0.0, 0.0, 0.0, 1.0])))
    states = {"ray": {}, "shadow": {}}
    for (kind, b, _), d in zip(keys, out):
        states[kind][b] = {k: np.asarray(v) for k, v in d.items()}
    return mesh, bvh, scene, cfg, states


# ---------------------------------------------------------------------------
# 2. NumPy sweep replay (exact gate/test control flow)
# ---------------------------------------------------------------------------

def _slab_np(box, o, inv):
    with np.errstate(invalid="ignore"):
        t0 = (box[0:3, None] - o) * inv
        t1 = (box[3:6, None] - o) * inv
        t_near = np.minimum(t0, t1).max(axis=0)
        t_far = np.maximum(t0, t1).min(axis=0)
    return t_near, t_far


class SweepStats:
    FIELDS = ("supers_gated", "supers_hit", "clusters_gated", "clusters_hit",
              "subs_gated", "subs_hit", "tests", "useful_lane_tests",
              "lanes", "tiles")

    def __init__(self):
        for f in self.FIELDS:
            setattr(self, f, 0)
        self.blocks = []  # per-tile sets of (cluster, sub) tested

    def as_dict(self):
        return {f: int(getattr(self, f)) for f in self.FIELDS}


def replay_sweep(tri, boxes, sboxes, order, o, d, t0, t_min, any_hit,
                 sub_tris, subs, cluster, sup):
    """Replay cluster_sweep for ONE tile (lanes flattened). Returns stats
    contribution + final (t, idx)."""
    L = o.shape[1]
    with np.errstate(divide="ignore"):
        inv = 1.0 / d
    t = t0.copy()
    idx = np.full(L, -1.0, np.float32)
    if any_hit:
        idx[np.abs(o[0]) >= 1e17] = 0.0  # parked lanes pre-satisfied
    st = SweepStats()
    st.tiles = 1
    st.lanes = L
    tile_blocks = set()

    for si in order:
        if any_hit and not (idx < 0.0).any():
            break  # early exit: every candidate blocked
        st.supers_gated += 1
        tn, tf = _slab_np(sboxes[si], o, inv)
        with np.errstate(invalid="ignore"):
            s_hit = (tn <= tf) & (tf > t_min) & (tn < t)
        if any_hit:
            s_hit &= idx < 0.0
        if not s_hit.any():
            continue
        st.supers_hit += 1
        for k in range(sup):
            c = si * sup + k
            st.clusters_gated += 1
            tn, tf = _slab_np(boxes[c], o, inv)
            with np.errstate(invalid="ignore"):
                ray_hit = (tn <= tf) & (tf > t_min) & (tn < t)
            if any_hit:
                ray_hit &= idx < 0.0
            if not ray_hit.any():
                continue
            st.clusters_hit += 1
            blk = tri[:, c * cluster:(c + 1) * cluster]
            lo = o - blk[20, 0:3][:, None]
            for sub in range(subs):
                st.subs_gated += 1
                sb = blk[14:20, sub]
                tn2, tf2 = _slab_np(sb, o, inv)
                with np.errstate(invalid="ignore"):
                    sub_hit = ray_hit & (tn2 <= tf2) & (tf2 > t_min) & (tn2 < t)
                if not sub_hit.any():
                    continue
                st.subs_hit += 1
                st.tests += sub_tris
                st.useful_lane_tests += int(sub_hit.sum()) * sub_tris
                tile_blocks.add((c, sub))
                # vectorized BW tests over the block (final t identical to
                # the kernel's sequential unroll: min over ok candidates)
                ks = slice(sub * sub_tris, (sub + 1) * sub_tris)
                n3 = blk[0:3, ks]          # (3, S)
                nd = blk[3, ks]
                r1 = blk[4:7, ks]
                c1 = blk[7, ks]
                r2 = blk[8:11, ks]
                c2 = blk[11, ks]
                with np.errstate(divide="ignore", invalid="ignore"):
                    den = np.einsum("ks,kl->sl", n3, d)
                    num = np.einsum("ks,kl->sl", n3, lo) + nd[:, None]
                    tt = -num / den
                    p = lo[None] + tt[:, None, :] * d[None]  # (S, 3, L)
                    u = np.einsum("ks,skl->sl", r1, p) + c1[:, None]
                    v = np.einsum("ks,skl->sl", r2, p) + c2[:, None]
                    ok = (sub_hit[None] & (u >= 0.0) & (v >= 0.0)
                          & (u + v <= 1.0) & (tt > t_min) & (tt < t[None]))
                any_ok = ok.any(axis=0)
                tt_ok = np.where(ok, tt, np.inf).min(axis=0)
                t = np.where(any_ok, np.minimum(t, tt_ok), t)
                idx = np.where(any_ok, 1.0, idx)  # identity of hit unused
    st.blocks.append(tile_blocks)
    return st, t, idx


def tile_lanes(plane, tile):
    """(H, W) -> iterator of flattened (th*tw,) tiles, kernel grid order."""
    h, w = plane.shape[-2:]
    th, tw = tile
    for i in range(h // th):
        for j in range(w // tw):
            yield plane[..., i * th:(i + 1) * th, j * tw:(j + 1) * tw].reshape(
                *plane.shape[:-2], th * tw)


def replay_frame(bvh, states, cfg, t_min, quick=False):
    """Replay every sweep of the frame; returns per-sweep stats + overlaps."""
    from raytracing_engine_tpu.accel.clusters import CLUSTER, SUBS, SUPER
    from raytracing_engine_tpu.accel.clusters import visit_order

    tri = np.asarray(bvh.tri)
    boxes = np.asarray(bvh.boxes)        # (C, 8)
    sboxes = np.asarray(bvh.super_boxes)  # (S, 8)
    # the megakernel uses a single camera-origin visit order for all bounces
    order = np.asarray(visit_order(bvh, np.zeros(3, np.float32)))

    scent = np.asarray(bvh.super_centroid)

    def run(kind, b, any_hit, order_mode="camera"):
        s = states[kind][b]
        o_t = list(tile_lanes(s["o"], TILE))
        d_t = list(tile_lanes(s["d"], TILE))
        if kind == "ray":
            t0_t = [np.full(o.shape[1], 3.4e38, np.float32) for o in o_t]
        else:
            t0_t = list(tile_lanes(s["dist"].astype(np.float32), TILE))
        agg = SweepStats()
        tiles = len(o_t)
        step = 4 if quick else 1  # sample every 4th tile in quick mode
        for i in range(0, tiles, step):
            if order_mode == "tile":
                # near-to-far from the tile's mean LIVE ray origin (the
                # candidate per-tile visit-order lever)
                o = o_t[i]
                live = np.abs(o[0]) < 1e17
                n_live = max(int(live.sum()), 1)
                mo = (np.where(live[None], o, 0.0).sum(axis=1) / n_live)
                d2 = ((scent - mo) ** 2).sum(axis=1)
                tile_order = np.argsort(d2)
            else:
                tile_order = order
            st, _, _ = replay_sweep(
                tri, boxes, sboxes, tile_order, o_t[i], d_t[i], t0_t[i],
                t_min, any_hit, CLUSTER // SUBS, SUBS, CLUSTER, SUPER)
            for f in SweepStats.FIELDS:
                setattr(agg, f, getattr(agg, f) + getattr(st, f))
            agg.blocks.append((i, st.blocks[0]))
        agg.scale = step
        return agg

    sweeps = {}
    n_b = cfg.max_bounces + 1
    for b in range(n_b):
        sweeps[f"closest_b{b}"] = run("ray", b, any_hit=False)
        sweeps[f"closest_b{b}@tile"] = run("ray", b, any_hit=False,
                                           order_mode="tile")
        if b in states["shadow"]:
            sweeps[f"shadow_b{b}"] = run("shadow", b, any_hit=True)
            sweeps[f"shadow_b{b}@tile"] = run("shadow", b, any_hit=True,
                                              order_mode="tile")

    # coupled-sweep sharing bound: shadow(b) and closest(b+1) rays share
    # origins; blocks needed by BOTH could share their row loads
    overlaps = {}
    for b in range(n_b - 1):
        sh = dict(sweeps[f"shadow_b{b}"].blocks)
        cl = dict(sweeps[f"closest_b{b+1}"].blocks)
        inter = union = 0
        for i in sh:
            if i in cl:
                inter += len(sh[i] & cl[i])
                union += len(sh[i] | cl[i])
        overlaps[f"shadow_b{b}+closest_b{b+1}"] = {
            "shared_blocks": inter, "union_blocks": union,
            "jaccard": round(inter / union, 3) if union else 0.0}
    return sweeps, overlaps


# ---------------------------------------------------------------------------
# 3. VPU throughput microbench (Pallas, independent FMA chains)
# ---------------------------------------------------------------------------

def vpu_peak_ops():
    """Measured f32 vector ops/s (FMA=1 op), register-resident.

    Round-2's microbench chained FMAs serially (measured LATENCY,
    0.28 Top/s); this one runs `acc` independent accumulator planes with
    the inner chain unrolled (`rounds` per loop trip), so the issue rate
    is what's measured. Reported peak = max over ILP variants."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        return None

    best = 0.0
    for acc, rounds, k in ((4, 8, 4000), (8, 8, 2000), (8, 16, 1000),
                           (16, 8, 1000)):
        rows = acc * 8  # accumulators are (8, 128) vreg planes

        def kern(x_ref, o_ref, *, acc=acc, rounds=rounds, k=k):
            a = jnp.float32(1.0000001)
            b = jnp.float32(1e-7)
            ys = tuple(x_ref[i * 8:(i + 1) * 8, :] for i in range(acc))

            def body(i, ys):
                for _ in range(rounds):      # unrolled: acc-way ILP
                    ys = tuple(y * a + b for y in ys)
                return ys

            ys = lax.fori_loop(0, k, body, ys)
            for i in range(acc):
                o_ref[i * 8:(i + 1) * 8, :] = ys[i]

        G = 32

        @jax.jit
        def run(x, _kern=kern, _rows=rows):
            return pl.pallas_call(
                _kern,
                out_shape=jax.ShapeDtypeStruct((G * _rows, 128), jnp.float32),
                grid=(G,),
                in_specs=[pl.BlockSpec((_rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((_rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(x)

        x = jnp.ones((G * rows, 128), jnp.float32)
        float(run(x).ravel()[0])
        dt = 1e30
        for r in range(3):
            x2 = x * (1.0 + 1e-6 * (r + 1))  # input-fresh
            t0 = time.perf_counter()
            float(run(x2).ravel()[0])
            dt = min(dt, time.perf_counter() - t0)
        ops = G * rows * 128 * rounds * k / dt
        print(f"  vpu microbench acc={acc} rounds={rounds}: "
              f"{ops/1e12:.3f} Top/s ({dt*1e3:.1f} ms)")
        best = max(best, ops)
    return best


# ---------------------------------------------------------------------------
# 4. measured per-sweep marginals
# ---------------------------------------------------------------------------

def measured_marginals(size):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from run_all import _chained, config3_scene
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega

    if jax.default_backend() != "tpu":
        return None

    mesh, bvh, scene, cfg, _ = config3_scene(size=size)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)

    out = {}
    for mb, nee in ((2, True), (1, True), (0, True), (2, False), (0, False)):
        c = dataclasses.replace(cfg, max_bounces=mb, use_nee=nee)

        def frame(z, _c=c):
            img, _ = render_pt_mega(_c, scene, jnp.array([0.0, 0.0, z]),
                                    quat, 1, key, bvh=bvh, tile=TILE)
            return img

        dt = _chained(frame)
        out[f"mb{mb}_nee{int(nee)}"] = round(dt * 1e3, 2)
        print(f"  measured mb={mb} nee={nee}: {dt*1e3:.2f} ms")
    return out


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--quick", action="store_true",
                    help="replay every 4th tile (scaled-up counts)")
    ap.add_argument("--no-timing", action="store_true")
    args = ap.parse_args()

    print("extracting per-bounce ray states...")
    t0 = time.perf_counter()
    cache = f"/tmp/config3_states_{args.size}.npz"
    if os.path.exists(cache):
        from run_all import config3_scene

        mesh, bvh, scene, cfg, _ = config3_scene(size=args.size)
        z = np.load(cache)
        states = {"ray": {}, "shadow": {}}
        for k in z.files:
            kind, b, name = k.split("|")
            states[kind].setdefault(int(b), {})[name] = z[k]
        print(f"  loaded cached states from {cache}")
    else:
        mesh, bvh, scene, cfg, states = extract_states(args.size)
        np.savez(cache, **{f"{kind}|{b}|{name}": v
                           for kind, per_b in states.items()
                           for b, d in per_b.items()
                           for name, v in d.items()})
    print(f"  {time.perf_counter()-t0:.1f}s; bounces={cfg.max_bounces}+1, "
          f"tris={mesh.shape[0]}, clusters={bvh.num_clusters}, "
          f"supers={bvh.num_super}")

    print("replaying sweeps in NumPy (exact gate/test control flow)...")
    t0 = time.perf_counter()
    sweeps, overlaps = replay_frame(bvh, states, cfg, cfg.t_min,
                                    quick=args.quick)
    print(f"  {time.perf_counter()-t0:.1f}s")

    peak = None
    marg = None
    if not args.no_timing:
        print("VPU throughput microbench...")
        peak = vpu_peak_ops()
        print("measured megakernel marginals...")
        marg = measured_marginals(args.size)

    # ---- report ----
    report = {"size": args.size, "tile": TILE, "quick": args.quick,
              "ops_model": {"test": OPS_TEST, "slab": OPS_SLAB},
              "vpu_peak_ops_per_s": peak, "measured_ms": marg,
              "sweeps": {}, "overlaps": overlaps}
    lanes = TILE[0] * TILE[1]
    total_model_ms = 0.0
    print(f"\n{'sweep':<14} {'supers':>7} {'clusters':>8} {'subs':>6} "
          f"{'tests':>7} {'occup%':>7} {'model_ms':>9}")
    for name, st in sweeps.items():
        scale = getattr(st, "scale", 1)
        slabs = (st.supers_gated + st.clusters_gated + st.subs_gated) * scale
        tests = st.tests * scale
        vec_ops = tests * OPS_TEST + slabs * OPS_SLAB
        lane_ops = vec_ops * lanes
        model_ms = lane_ops / peak * 1e3 if peak else None
        occ = (st.useful_lane_tests / (st.tests * lanes) * 100
               if st.tests else 0.0)
        total_model_ms += model_ms or 0.0
        if "@" in name:
            total_model_ms -= model_ms or 0.0  # variants don't sum into the frame
        row = st.as_dict()
        row.update(scale=scale, vec_ops=int(vec_ops), occupancy_pct=round(occ, 1),
                   model_ms=round(model_ms, 2) if model_ms else None)
        report["sweeps"][name] = row
        print(f"{name:<14} {st.supers_hit*scale:>7} {st.clusters_hit*scale:>8} "
              f"{st.subs_hit*scale:>6} {tests:>7} {occ:>6.1f}% "
              f"{model_ms if model_ms is None else f'{model_ms:9.2f}'}")
    for k, v in overlaps.items():
        print(f"overlap {k}: {v}")
    if marg and peak:
        meas = marg.get("mb2_nee1")
        report["model_total_ms"] = round(total_model_ms, 2)
        report["arithmetic_floor_pct"] = round(total_model_ms / meas * 100, 1)
        print(f"\nmodel arithmetic total {total_model_ms:.1f} ms vs measured "
              f"{meas} ms -> {report['arithmetic_floor_pct']}% of frame is "
              f"modeled VPU arithmetic at {peak/1e12:.3f} Top/s")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "instrument_config3.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")

    from history import append_history

    append_history("instrument_config3", {
        "size": args.size,
        "measured_ms": marg,
        "model_total_ms": report.get("model_total_ms"),
        "arithmetic_floor_pct": report.get("arithmetic_floor_pct")})


if __name__ == "__main__":
    main()

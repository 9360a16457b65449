"""On-chip A/B: config-5 PT (1M-tri two-level instanced) mega vs rebin.

Round-4 landed instanced rebin (KernelInstances through the per-bounce
launches, CPU-parity-tested) but never measured it on hardware; the
hypothesis is that the dead-lane compaction that took config 3 from
132.9 -> 95.4 ms wins MORE here — 1M-tri instanced bounce sweeps are even
sparser (~0.1% secondary occupancy over 30 instances).

Same scene/builders as benchmarks/run_all.config5pt_instanced, one
process, min-of-reps chained frames. Writes ab_instanced_rebin.json +
history record.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from raytracing_engine_tpu.accel import build_bvh, torus_knot
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import (
        grid_instances,
        make_instanced_clusters,
    )
    from raytracing_engine_tpu.ops.pallas.pt_kernel import (
        render_pt_mega,
        render_pt_rebin,
    )
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    t0 = time.perf_counter()
    mesh = torus_knot(segments=550, sides=32)
    bvh = build_bvh(mesh)
    cs = build_clusters(mesh)
    inst = grid_instances(bvh, nx=6, ny=5, spacing=4.0, base=(0.0, 14.0, 0.0),
                          mats=np.arange(30, dtype=np.int32) % 3)
    scene = build_pt_scene(
        spheres=[((8.0, 2.0, 10.0), 2.0, 3), ((0.0, 14.0, -103.0), 100.0, 4)],
        materials=[
            {"albedo": (0.75, 0.5, 0.3), "kind": DIFFUSE},
            {"albedo": (0.4, 0.7, 0.5), "kind": DIFFUSE},
            {"albedo": (0.5, 0.5, 0.8), "kind": DIFFUSE},
            {"albedo": (0, 0, 0), "emission": (40.0, 38.0, 34.0),
             "kind": DIFFUSE},
            {"albedo": (0.55, 0.55, 0.5), "kind": DIFFUSE},
        ])
    ic = make_instanced_clusters(inst, cs, scene=scene)
    cfg = PTConfig(width=args.size, height=args.size, max_bounces=2,
                   rng="pcg")
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    print(f"scene ready ({time.perf_counter() - t0:.0f}s), "
          f"{int(inst.total_triangles)} tris x {inst.num_instances} inst, "
          f"backend={jax.default_backend()}")

    vid = [0]  # per-variant unique camera inputs (tunnel memoization)

    def measure(label, fn):
        vid[0] += 1
        zb = 0.0137 * vid[0]
        t0 = time.perf_counter()
        ready = fn(zb - 7e-3)
        compile_s = time.perf_counter() - t0
        float(ready[0, 0, 0])  # fetched: compile run fully done
        rtts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(ready[0, 0, 0])
            rtts.append(time.perf_counter() - t0)
        rtt = sorted(rtts)[1]
        best = 1e30
        n = 4
        for r in range(args.reps):
            t0 = time.perf_counter()
            chain = jnp.float32(0.0)
            for i in range(n):
                img = fn(zb + 1e-3 * r + 1e-4 * i + chain)
                chain = img[0, 0, 0] * 0.0
            # FETCH, don't just block (bench.py tunnel discipline)
            float(img[0, 0, 0])
            best = min(best, (time.perf_counter() - t0 - rtt) / n)
        ms = best * 1e3
        print(f"{label:40s} {ms:7.1f} ms  (compile {compile_s:.0f}s, "
              f"rtt {rtt * 1e3:.0f} ms)", flush=True)
        return {"label": label, "ms": round(ms, 1),
                "compile_s": round(compile_s, 1),
                "rtt_ms": round(rtt * 1e3, 1)}

    def mega(z):
        img, _ = render_pt_mega(cfg, scene, jnp.array([0.0, 0.0, z]), quat,
                                1, key, bvh=ic, tile=(32, 128))
        return img

    def rebin(z, modes, **kw):
        img, _ = render_pt_rebin(cfg, scene, jnp.array([0.0, 0.0, z]), quat,
                                 1, key, bvh=ic, tile=(32, 128),
                                 rebin=modes, **kw)
        return img

    rows = [measure("mega tile=32x128 (round-4 best)", mega)]
    rows.append(measure("rebin none,morton skip=on",
                        lambda z: rebin(z, "none,morton")))
    rows.append(measure("rebin morton skip=on",
                        lambda z: rebin(z, "morton")))
    rows.append(measure("rebin none,morton skip=off",
                        lambda z: rebin(z, "none,morton", skip_dead=False)))

    best = min(rows, key=lambda r: r["ms"])
    print(f"\nbest: {best['label']} = {best['ms']} ms "
          f"({100 * (1 - best['ms'] / rows[0]['ms']):.1f}% vs mega)")

    rec = {
        "experiment": "ab_instanced_rebin",
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "size": args.size,
        "scene": "config5pt: torus-knot 35k tris x 30 instances (1M), "
                 "2-bounce+NEE, 1 spp",
        "rows": rows,
        "best": best,
        "note": "instanced (two-level) scenes through the rebin engine "
                "on chip for the first time; same scene builders as "
                "run_all.config5pt_instanced",
    }
    out = os.path.join(os.path.dirname(__file__), "ab_instanced_rebin.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}")
    try:
        from history import append_history
        append_history("ab_instanced_rebin",
                       {"best_ms": best["ms"], "best": best["label"],
                        "mega_ms": rows[0]["ms"], "size": args.size})
    except Exception as e:
        print(f"history append skipped: {e}")


if __name__ == "__main__":
    main()

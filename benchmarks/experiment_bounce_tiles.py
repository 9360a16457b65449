"""Bounce-granularity study on config 3 (70k-tri, 512^2, 2-bounce+NEE).

Round-4 verdict item 3: ROADMAP.md attributes ~57 ms of the rebin
frame to the bounce-1 incoherent sweep "at this tile granularity" — a
qualifier never tested once launches became per-bounce. The rebin
renderer's per-launch knobs are now independent:

  tile      bounce-0 (camera-coherent) tile shape + stripes
  tile_b    bounce>=1 tile shape (regrouped/sorted-rank tiles)
  skip_dead all-dead tile early-out in bounce launches (bit-exact:
            dead state planes are a fixed point of the bounce window)

All variants run in ONE process against ONE scene/cluster build, with
min-of-reps over dependency-chained frames (the same discipline as
benchmarks/experiment_transport.py), so numbers are comparable without
process-to-process compile/clock noise.

Writes benchmarks/experiment_bounce_tiles.json + a history record.
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
    ap.add_argument("--quick", action="store_true",
                    help="fewer variants (skip_dead + one tile_b only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from run_all import config3_scene
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_rebin

    mesh, bvh, scene, cfg, build_s = config3_scene(size=args.size)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    print(f"scene ready ({build_s:.0f}s build), "
          f"backend={jax.default_backend()}")

    vid = [0]  # per-variant unique camera inputs (the tunnel memoizes
    #            repeated identical dispatches — bench.py discipline)

    def measure(label, **kw):
        vid[0] += 1
        zb = 0.0123 * vid[0]

        def run(z):
            img, nr = render_pt_rebin(cfg, scene, jnp.array([0.0, 0.0, z]),
                                      quat, 1, key, bvh=bvh, **kw)
            return img

        t0 = time.perf_counter()
        ready = run(zb - 7e-3)  # compile
        compile_s = time.perf_counter() - t0
        float(ready[0, 0, 0])  # fetched: compile run fully done
        # fetch RTT of already-computed data, to subtract from timed reps
        rtts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(ready[0, 0, 0])
            rtts.append(time.perf_counter() - t0)
        rtt = sorted(rtts)[1]
        best = 1e30
        n = 8
        for r in range(args.reps):
            t0 = time.perf_counter()
            chain = jnp.float32(0.0)
            for i in range(n):
                img = run(zb + 1e-3 * r + 1e-4 * i + chain)
                chain = img[0, 0, 0] * 0.0
            # FETCH, don't just block: block_until_ready has returned
            # early on unconsumed outputs over the tunnel
            float(img[0, 0, 0])
            best = min(best, (time.perf_counter() - t0 - rtt) / n)
        ms = best * 1e3
        print(f"{label:44s} {ms:7.2f} ms  (compile {compile_s:.0f}s, "
              f"rtt {rtt * 1e3:.0f} ms)", flush=True)
        return {"label": label, "ms": round(ms, 2),
                "compile_s": round(compile_s, 1),
                "rtt_ms": round(rtt * 1e3, 1), **{
                    k: (list(v) if isinstance(v, tuple) else v)
                    for k, v in kw.items()}}

    R = "none,morton"
    rows = []
    # the two headline A/Bs first
    rows.append(measure("base tile=32x128 skip_dead=off", tile=(32, 128),
                        rebin=R, skip_dead=False))
    rows.append(measure("base tile=32x128 skip_dead=on", tile=(32, 128),
                        rebin=R, skip_dead=True))
    rows.append(measure("tile_b=8x128 skip=on", tile=(32, 128),
                        tile_b=(8, 128), rebin=R, skip_dead=True))
    if not args.quick:
        rows.append(measure("tile_b=8x128 skip=off", tile=(32, 128),
                            tile_b=(8, 128), rebin=R, skip_dead=False))
        rows.append(measure("tile_b=16x128 skip=on", tile=(32, 128),
                            tile_b=(16, 128), rebin=R, skip_dead=True))
        rows.append(measure("tile_b=64x128 skip=on", tile=(32, 128),
                            tile_b=(64, 128), rebin=R, skip_dead=True))
        rows.append(measure("tile0=16x128 tile_b=32x128", tile=(16, 128),
                            tile_b=(32, 128), rebin=R, skip_dead=True))
        rows.append(measure("tile0=8x128 tile_b=32x128", tile=(8, 128),
                            tile_b=(32, 128), rebin=R, skip_dead=True))
        rows.append(measure("tile0=32x128 stripes=4 (squarer b0)",
                            tile=(32, 128), stripes=4, rebin=R,
                            skip_dead=True))
        # morton from the FIRST gap (dead compaction can't matter at
        # bounce 1 — rays alive — but skip_dead + sorted-rank tiles
        # might now beat 'none' with per-launch shapes)
        rows.append(measure("rebin=morton,morton skip=on", tile=(32, 128),
                            rebin="morton,morton", skip_dead=True))

    best = min(rows, key=lambda r: r["ms"])
    base = rows[0]["ms"]
    print(f"\nbest: {best['label']} = {best['ms']} ms "
          f"({100 * (1 - best['ms'] / base):.1f}% vs skip-off base)")

    rec = {
        "experiment": "bounce_tiles",
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "size": args.size,
        "scene": "config3 torus-knot 70k tris, 2-bounce+NEE, 1 spp",
        "rows": rows,
        "best": best,
        "note": "per-launch tile shape + all-dead tile skip A/B; one "
                "process, one cluster build, min-of-reps chained frames",
    }
    out = os.path.join(os.path.dirname(__file__),
                       "experiment_bounce_tiles.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}")
    try:
        from history import append_history
        append_history("experiment_bounce_tiles",
                       {"best_ms": best["ms"], "best": best["label"],
                        "base_ms": base, "size": args.size})
    except Exception as e:
        print(f"history append skipped: {e}")


if __name__ == "__main__":
    main()

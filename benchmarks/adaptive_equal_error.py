"""Adaptive sampling at EQUAL ERROR (VERDICT round-3 item 7).

The round-3 quality-normalized row compared fixed vs adaptive at the same
spp BUDGET and measured adaptive at worse MSE — an operating point, not an
equal-error claim. This sweep produces the claim properly: on two scenes
(one variance-UNIFORM — Cornell interior, adaptive's worst case — and one
variance-CONTRAST — spheres over a flat gradient sky, adaptive's case),
measure (seconds, MSE-vs-2048spp-reference) for

  fixed     R_d sampler, spp in a ladder
  adaptive  R_d sampler + per-tile stopping, tol ladder, budget = max spp

then for each tol log-interpolate the fixed curve at the adaptive MSE:
speedup = fixed-time-at-equal-error / adaptive-time. Writes
benchmarks/adaptive_equal_error.json and prints the per-scene curves; the
recommended default tol maximizes the worst-scene speedup (>= 1 means
"never worse at equal error").

Usage: python benchmarks/adaptive_equal_error.py [--size 256] [--quick]
(TPU hardware; timings are input-fresh second calls with fetched outputs.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _scenes(size):
    import jax.numpy as jnp

    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene
    from raytracing_engine_tpu.pathtracer.scenes import cornell_box

    cornell = (PTConfig(width=size, height=size, max_bounces=4, rng="pcg"),
               cornell_box(), jnp.array([0.0, 0.2, 0.0]))
    # variance-contrast scene: an area-lit sphere cluster over a flat
    # gradient sky — background tiles converge in a handful of passes,
    # geometry tiles carry the noise
    contrast_scene = build_pt_scene(
        spheres=[((0.0, 7.0, -0.5), 1.2, 0), ((2.0, 6.0, 0.3), 0.8, 1),
                 ((-2.2, 7.5, 0.0), 0.9, 2), ((0.5, 5.0, -52.0), 50.0, 0),
                 ((3.0, 9.0, 3.0), 0.7, 3)],
        materials=[{"albedo": (0.7, 0.6, 0.5), "kind": DIFFUSE},
                   {"albedo": (0.9, 0.9, 0.9), "kind": 1},     # mirror
                   {"albedo": (1.0, 1.0, 1.0), "kind": 3, "ior": 1.5},
                   {"albedo": (0, 0, 0), "emission": (30.0,) * 3,
                    "kind": DIFFUSE}],
        env=((0.35, 0.4, 0.5), (0.7, 0.8, 1.0)))
    contrast = (PTConfig(width=size, height=size, max_bounces=4, rng="pcg"),
                contrast_scene, jnp.zeros(3))
    return {"cornell": cornell, "contrast": contrast}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega

    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    tile = (16, 256)
    fixed_ladder = [32, 64, 128] if args.quick else [16, 32, 64, 128, 256, 512]
    tols = [0.05, 0.1] if args.quick else [0.02, 0.05, 0.1, 0.15]
    budget = max(fixed_ladder)

    out = {"size": args.size, "scenes": {}}
    for name, (cfg, scene, pos) in _scenes(args.size).items():
        r2 = dataclasses.replace(cfg, sampler="r2")
        ref_img, _ = render_pt_mega(cfg, scene, pos, quat, 2048,
                                    jax.random.PRNGKey(99), tile=tile)
        ref = np.asarray(jax.block_until_ready(ref_img))

        def timed(spp, tol):
            kw = dict(tile=tile)
            if tol:
                kw.update(adaptive_tol=tol, return_spp=True)
            r = render_pt_mega(r2, scene, pos, quat, spp, key, **kw)
            float(np.asarray(r[0]).ravel()[0])  # warm/compile
            t0 = time.perf_counter()
            r = render_pt_mega(r2, scene, pos, quat, spp, key,
                               spp_offset=1, **kw)
            float(np.asarray(r[0]).ravel()[0])
            dt = time.perf_counter() - t0
            mse = float(((np.asarray(r[0]) - ref) ** 2).mean())
            mean_spp = (float(np.asarray(r[2]).mean()) if tol else spp)
            return dt, mse, mean_spp

        fixed = []
        for spp in fixed_ladder:
            dt, mse, _ = timed(spp, None)
            fixed.append({"spp": spp, "s": round(dt, 3),
                          "mse": round(mse, 7)})
            print(f"{name:9s} fixed {spp:4d}: {dt:6.2f} s  mse {mse:.3g}")
        adapt = []
        ft = np.array([f["s"] for f in fixed])
        fm = np.array([f["mse"] for f in fixed])
        for tol in tols:
            dt, mse, mean_spp = timed(budget, tol)
            # fixed time at this MSE: log-log interp of the fixed curve
            # (MSE decreasing in spp); outside the ladder -> clamp + note
            lm = np.log(fm[::-1])
            lt = np.log(ft[::-1])
            t_eq = float(np.exp(np.interp(np.log(mse), lm, lt)))
            clamped = mse < fm.min() or mse > fm.max()
            adapt.append({"tol": tol, "s": round(dt, 3),
                          "mse": round(mse, 7),
                          "mean_spp": round(mean_spp, 1),
                          "fixed_s_at_equal_mse": round(t_eq, 3),
                          "speedup": round(t_eq / dt, 3),
                          "extrapolated": bool(clamped)})
            print(f"{name:9s} tol {tol:5.2f}: {dt:6.2f} s  mse {mse:.3g}  "
                  f"mean_spp {mean_spp:6.1f}  equal-error fixed "
                  f"{t_eq:6.2f} s  -> x{t_eq / dt:.2f}")
        out["scenes"][name] = {"fixed": fixed, "adaptive": adapt}

    # default tol = best WORST-scene speedup (>= 1 = never worse)
    worst = {}
    for tol in tols:
        worst[tol] = min(
            next(a["speedup"] for a in out["scenes"][s]["adaptive"]
                 if a["tol"] == tol)
            for s in out["scenes"])
    best_tol = max(worst, key=worst.get)
    out["recommended_tol"] = best_tol
    out["worst_scene_speedup"] = worst[best_tol]
    print(f"recommended tol {best_tol} (worst-scene equal-error speedup "
          f"x{worst[best_tol]:.2f})")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "adaptive_equal_error.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    try:
        from history import append_history

        append_history("adaptive_equal_error", out)
    except Exception as e:  # pragma: no cover
        print(f"history unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()

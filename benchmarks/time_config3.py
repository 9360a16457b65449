"""Quick config-3 timer: 70k-tri mesh, 512^2, 2-bounce + NEE megakernel.

Usage: python benchmarks/time_config3.py [--tile 32x128] [--size 512]
Prints frame ms over dependency-chained evaluations. Uses the SAME scene
builder as benchmarks/run_all.py (config3_scene), so this timer can never
drift from what results.json reports.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", default="32x128")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stripes", type=int, default=None)
    ap.add_argument("--path", default="mega",
                    choices=["mega", "fast", "rebin"],
                    help="mega = in-kernel bounce loop; fast = per-bounce "
                         "XLA wavefront (supports --sort); rebin = "
                         "per-bounce megakernel + lax.sort regroup")
    ap.add_argument("--sort", default="none",
                    choices=["none", "true", "compact", "compact_oct"],
                    help="between-bounce regroup mode (fast path only)")
    ap.add_argument("--rebin", default="morton",
                    help="regroup key(s), comma-joined per gap (rebin "
                         "path): oct | morton | oct_morton")
    ap.add_argument("--tile-b", default=None, dest="tile_b",
                    help="tile shape for bounce>=1 launches (rebin path; "
                         "default = --tile)")
    ap.add_argument("--no-skip-dead", action="store_true",
                    help="disable the all-dead tile early-out in bounce "
                         "launches (rebin path)")
    ap.add_argument("--bounces", type=int, default=None,
                    help="override cfg.max_bounces (per-bounce profiling)")
    ap.add_argument("--groups", type=int, default=1,
                    help="row-group-gated test issue (mega path)")
    ap.add_argument("--fast-math", action="store_true",
                    help="approximate reciprocal in closest-hit tests "
                         "(mega path; ~2^-14 t error)")
    ap.add_argument("--bvh", default="sah", choices=["sah", "median"],
                    help="BVH partitioner behind the cluster cut")
    ap.add_argument("--descend", type=int, default=None,
                    help="subtree-pack descend depth (default max_tris//2)")
    ap.add_argument("--align", default="subtree",
                    choices=["subtree", "fixed", "dp"],
                    help="cluster cut: subtree boundaries, fixed 128s, or "
                         "DP-optimal partition under the lane-ops model")
    ap.add_argument("--dp-kc", type=float, default=0.25,
                    help="per-cluster constant for --align dp")
    args = ap.parse_args()
    tile = tuple(int(x) for x in args.tile.split("x"))

    import jax
    import jax.numpy as jnp

    from run_all import config3_scene
    from raytracing_engine_tpu.ops.pallas.pt_kernel import (
        render_pt_mega,
        render_pt_rebin,
    )
    from raytracing_engine_tpu.pathtracer.wavefront import render_pt_fast

    mesh, bvh, scene, cfg, _ = config3_scene(size=args.size,
                                             bvh_method=args.bvh,
                                             descend=args.descend,
                                             align=args.align,
                                             dp_kc=args.dp_kc)
    if args.bounces is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, max_bounces=args.bounces)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    sort = {"none": False, "true": True}.get(args.sort, args.sort)

    def run(z):
        pos = jnp.array([0.0, 0.0, z])
        if args.path == "fast":
            img, nr = render_pt_fast(cfg, scene, pos, quat, 1, key, bvh=bvh,
                                     sort=sort)
        elif args.path == "rebin":
            tile_b = (tuple(int(x) for x in args.tile_b.split("x"))
                      if args.tile_b else None)
            img, nr = render_pt_rebin(cfg, scene, pos, quat, 1, key, bvh=bvh,
                                      tile=tile, rebin=args.rebin,
                                      stripes=args.stripes, tile_b=tile_b,
                                      skip_dead=not args.no_skip_dead)
        else:
            img, nr = render_pt_mega(cfg, scene, pos, quat, 1, key, bvh=bvh,
                                     tile=tile, stripes=args.stripes,
                                     groups=args.groups,
                                     fast_math=args.fast_math)
        return img, nr

    img, nr = run(0.0)  # compile
    jax.block_until_ready(img)
    best = 1e30
    for r in range(args.reps):
        t0 = time.perf_counter()
        chain = jnp.float32(0.0)
        n = 4
        for i in range(n):
            img, _ = run(1e-4 * i + chain)
            chain = img[0, 0, 0] * 0.0  # dependency chain (stays on device)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / n
        best = min(best, dt)
    nrays = float(nr)
    print(f"path={args.path} sort={args.sort} rebin={args.rebin} "
          f"groups={args.groups} "
          f"fast_math={args.fast_math} bvh={args.bvh} "
          f"descend={args.descend} align={args.align} "
          f"tile={tile} stripes={args.stripes} size={args.size}: "
          f"{best*1e3:.2f} ms/frame, {nrays/best/1e6:.2f} Mrays/s "
          f"(n={nrays:.0f})")


if __name__ == "__main__":
    main()

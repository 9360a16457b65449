"""Run the BASELINE.json benchmark configs on real TPU hardware.

Writes benchmarks/results.json and prints a markdown table for BASELINE.md.
Timing methodology: compile/warm with one camera input, time with others
(the tunnel memoizes repeated identical dispatches), fetch a scalar to force
completion (block_until_ready alone has been unreliable — see bench.py).

Usage:  python benchmarks/run_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, variants, fetch=lambda r: float(r[0].ravel()[0])):
    """fn(variant) -> result; compiles on variants[0], times the rest."""
    fetch(fn(variants[0]))
    best = float("inf")
    for v in variants[1:]:
        t0 = time.perf_counter()
        fetch(fn(v))
        best = min(best, time.perf_counter() - t0)
    return best


def _chained(frame_fn, frames=4, variants=(0.0, 1e-3, 2e-3)):
    """Best per-frame seconds over `frames` dependency-linked frames run
    inside ONE jit dispatch: frame i's camera input consumes a full-image
    reduction of frame i-1, so nothing can be elided or overlapped, while
    the ~25 ms tunnel dispatch RTT amortizes across the chain (production
    serving shape — see runtime/serve.render_sequence).

    frame_fn(z) -> image (or (image, ...)); z perturbs the camera so every
    frame is input-fresh."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(z0):
        def body(i, acc):
            out = frame_fn(z0 + 1e-4 * i + 0.0 * acc)
            img = out[0] if isinstance(out, tuple) else out
            return acc + jnp.mean(img)

        return (lax.fori_loop(0, frames, body, jnp.float32(0.0)),)

    # _timed compiles/warms on variants[0] and times only variants[1:]
    return _timed(chain, list(variants)) / frames


def config1_parity(results):
    """512x512 cone-march frame (reference default scene) + parity stats."""
    import jax
    import jax.numpy as jnp

    import raytracing_engine_tpu as rt
    from raytracing_engine_tpu.models import pallas_renderer
    from raytracing_engine_tpu.utils.timing import conemarch_ray_count

    cfg = rt.RenderConfig(width=512, height=512)
    scene = rt.default_scene()
    n_obj, n_light = int(scene.obj_count), int(scene.light_count)

    def frame(z):
        return pallas_renderer.render_jit(
            cfg, scene, jnp.array([0.0, 0.0, z]), jnp.array([0.0, 0.0, 0.0, 1.0]),
            n_obj=n_obj, n_light=n_light)

    dt = _chained(frame, frames=8)
    p, s = conemarch_ray_count(cfg, n_light)
    results["config1_512_conemarch"] = {
        "frame_ms": round(dt * 1e3, 3),
        "mrays": round((p + s) / dt / 1e6, 1),
        "note": "pixel parity with the scalar golden reference is enforced "
                "by tests/; chained dependency-linked frames",
    }


def config2_spheres(results, spp=4):  # megakernel
    """800x608, 4-bounce path tracing, 4 spp (multi-material spheres)."""
    import jax
    import jax.numpy as jnp

    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scenes import material_spheres

    cfg = PTConfig(width=800, height=608, max_bounces=4, rng="pcg")
    scene = material_spheres()
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    nrays = {}

    def frame(z):
        img, nr = render_pt_mega(cfg, scene, jnp.array([0.0, 0.0, z]), quat, spp, key)
        nrays["n"] = nr
        return img

    _timed(lambda z: (frame(z),), [5e-3])  # ray count (outside jit)
    n_rays = float(nrays["n"])
    dt = _chained(frame)
    results["config2_800x608_4spp_pt"] = {
        "frame_ms": round(dt * 1e3, 2),
        "mrays": round(n_rays / dt / 1e6, 1),
        "spp": spp,
        "bounces": 4,
    }


def config3_scene(size=512, segments=1100, bvh_method="sah", descend=None,
                  align="subtree", dp_kc=0.25):
    """The config-3 bench scene: (mesh, ClusterSet, PTScene, PTConfig,
    cluster build seconds). Shared with benchmarks/time_config3.py so the
    standalone timer can never drift from what results.json reports."""
    from raytracing_engine_tpu.accel import torus_knot
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    mesh = torus_knot(segments=segments, sides=32, center=(0.0, 8.0, 0.0))
    t0 = time.perf_counter()
    bvh = build_clusters(mesh, tri_mats=np.zeros(mesh.shape[0], np.int32),
                         method=bvh_method, descend=descend, align=align,
                         dp_kc=dp_kc)
    build_s = time.perf_counter() - t0
    mats = [
        {"albedo": (0.7, 0.6, 0.4), "kind": DIFFUSE},
        {"albedo": (0, 0, 0), "emission": (10.0,) * 3, "kind": DIFFUSE},
        {"albedo": (0.5, 0.5, 0.6), "kind": DIFFUSE},
    ]
    scene = build_pt_scene(
        spheres=[((6.0, 4.0, 6.0), 1.5, 1), ((0.0, 8.0, -103.0), 100.0, 2)],
        triangles=mesh,
        tri_mats=np.zeros(mesh.shape[0], np.int32),
        materials=mats,
    )
    cfg = PTConfig(width=size, height=size, max_bounces=2, rng="pcg")
    return mesh, bvh, scene, cfg, build_s


def config3_bvh(results, size=512, segments=1100):
    """~70k-triangle mesh through the cluster megakernel."""
    import jax
    import jax.numpy as jnp

    mesh, bvh, scene, cfg, build_s = config3_scene(size, segments)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    nrays = {}

    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_rebin

    def frame(z):
        # rebin renderer: per-bounce megakernel launches + a lax.sort ray
        # regroup between bounces (bit-identical to the single-launch
        # megakernel, tested). Chip A/B @512^2: mega 132.9 ms -> rebin
        # 95.4 ms with the default 'none,morton' gap keys — the bounce
        # sweeps' dead lanes compact away and survivors group by origin
        # cell, which the in-kernel levers could never buy (ROADMAP §1).
        img, nr = render_pt_rebin(cfg, scene, jnp.array([0.0, 0.0, z]),
                                  quat, 1, key, bvh=bvh, tile=(32, 128))
        nrays["n"] = nr
        return img

    _timed(lambda z: (frame(z),), [5e-3])  # ray count (outside jit)
    n_rays = float(nrays["n"])
    dt = _chained(frame)
    results["config3_70ktri_bvh"] = {
        "triangles": int(mesh.shape[0]),
        "resolution": size,
        "frame_ms": round(dt * 1e3, 2),
        "mrays": round(n_rays / dt / 1e6, 2),
        "accel_build_s": round(build_s, 2),
        "clusters": int(bvh.num_clusters),
        "note": "rebin engine (per-bounce megakernel + lax.sort regroup, "
                "bit-identical to the single-launch megakernel), chained "
                "dependency-linked frames",
    }


def config3_1080p(results, segments=1100):
    """The driver metric is 1080p frame time (BASELINE.json:2) — this row
    puts the MESH path tracer on that axis, not just the cone-marcher:
    same 70k-tri scene/cluster build as config 3, rendered 1920x1088
    2-bounce+NEE through the rebin engine."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    mesh, bvh, scene, cfg, build_s = config3_scene(512, segments)
    cfg = dataclasses.replace(cfg, width=1920, height=1088)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    nrays = {}

    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_rebin

    def frame(z):
        img, nr = render_pt_rebin(cfg, scene, jnp.array([0.0, 0.0, z]),
                                  quat, 1, key, bvh=bvh, tile=(32, 128))
        nrays["n"] = nr
        return img

    _timed(lambda z: (frame(z),), [5e-3])  # ray count (outside jit)
    n_rays = float(nrays["n"])
    dt = _chained(frame, frames=2)
    results["config3_70ktri_bvh_1080p"] = {
        "triangles": int(mesh.shape[0]),
        "resolution": "1920x1088",
        "frame_ms": round(dt * 1e3, 1),
        "mrays": round(n_rays / dt / 1e6, 2),
        "note": "70k-tri mesh PT at the driver's 1080p axis (rebin "
                "engine, 2-bounce+NEE, 1 spp, chained frames)",
    }


def config4_progressive(results, spp=1024, size=256):
    """Progressive accumulation with NEE on the area-lit interior (Cornell)."""
    import jax
    import jax.numpy as jnp

    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scenes import cornell_box

    cfg = PTConfig(width=size, height=size, max_bounces=4, rng="pcg")
    scene = cornell_box()
    pos = jnp.array([0.0, 0.2, 0.0])
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)

    # small images want small tiles (a 256^2 frame is only 4 (64,256)
    # tiles — poor convergence balance; measured 6.6 s vs 3.5 s at 1024 spp)
    tile = (16, 256)
    # warm/compile with a small chunk
    img, _ = render_pt_mega(cfg, scene, pos, quat, 16, key, tile=tile)
    float(img.ravel()[0])
    t0 = time.perf_counter()
    total = 0
    chunk = 128
    nr_total = 0.0
    while total < spp:
        img, nr = render_pt_mega(cfg, scene, pos, quat, chunk, key,
                                 spp_offset=total, tile=tile)
        nr_total += float(nr)
        total += chunk
    float(img.ravel()[0])
    dt = time.perf_counter() - t0
    results["config4_cornell_1024spp_nee"] = {
        "resolution": size,
        "spp": spp,
        "total_s": round(dt, 2),
        "spp_per_s": round(spp / dt, 1),
        "mrays": round(nr_total / dt / 1e6, 1),
    }

    # quality-normalized row: the R_d sampler + per-tile adaptive stopping
    # at equal-or-better error than a fixed-spp random render. Reference =
    # a long independent-key render; error = MSE against it.
    import numpy as np

    ref_img, _ = render_pt_mega(cfg, scene, pos, quat, 2048,
                                jax.random.PRNGKey(99), tile=tile)
    ref = np.asarray(jax.block_until_ready(ref_img))

    import dataclasses

    r2cfg = dataclasses.replace(cfg, sampler="r2")
    fixed_spp = 256
    img_f, _ = render_pt_mega(cfg, scene, pos, quat, fixed_spp, key,
                              tile=tile)
    float(img_f.ravel()[0])
    t0 = time.perf_counter()
    img_f, _ = render_pt_mega(cfg, scene, pos, quat, fixed_spp, key,
                              spp_offset=1, tile=tile)
    float(img_f.ravel()[0])
    t_fixed = time.perf_counter() - t0
    mse_fixed = float(((np.asarray(img_f) - ref) ** 2).mean())

    img_q, _, sm = render_pt_mega(r2cfg, scene, pos, quat, fixed_spp, key,
                                  tile=tile, adaptive_tol=0.05,
                                  return_spp=True)
    float(img_q.ravel()[0])
    t0 = time.perf_counter()
    img_q, _, sm = render_pt_mega(r2cfg, scene, pos, quat, fixed_spp, key,
                                  spp_offset=1, tile=tile,
                                  adaptive_tol=0.05, return_spp=True)
    float(img_q.ravel()[0])
    t_q = time.perf_counter() - t0
    mse_q = float(((np.asarray(img_q) - ref) ** 2).mean())
    results["config4_quality_normalized"] = {
        "resolution": size,
        "fixed": {"spp": fixed_spp, "s": round(t_fixed, 3),
                  "mse": round(mse_fixed, 6)},
        "r2_adaptive": {"spp_budget": fixed_spp, "tol": 0.05,
                        "mean_spp": round(float(np.asarray(sm).mean()), 1),
                        "s": round(t_q, 3), "mse": round(mse_q, 6)},
        "note": "R_d sampler + per-tile adaptive stopping vs fixed random "
                "sampling at the same spp budget: (time, MSE) tuples vs an "
                "independent 2048-spp reference — read as quality-per-"
                "second, no equal-error claim (adaptive's win is scene-"
                "dependent: it needs variance CONTRAST between tiles)",
    }


def config5_instanced(results, width=1920, height=1088, frames=8):
    """1M+ instanced triangles, interactive 1080p camera orbit (stretch).

    Fully SHADED frames (the reference shades everything it draws,
    fragment.glsl:127-187): the attrs-emitting Pallas instanced cluster
    kernel returns world normals, Blinn/Phong lighting with the reference
    falloffs, plus hard shadows from a second any-hit launch.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from raytracing_engine_tpu.accel import build_bvh, torus_knot
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import grid_instances
    from raytracing_engine_tpu.models.instanced import render_instanced_phong
    from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
        pack_instances,
    )

    mesh = torus_knot(segments=550, sides=32)  # 35200 tris per instance
    bvh = build_bvh(mesh)
    cs = build_clusters(mesh)  # in-process numpy build (no device round trip)
    inst = grid_instances(
        bvh, nx=6, ny=5, spacing=4.0, base=(0.0, 14.0, 0.0),
        mats=np.arange(30, dtype=np.int32) % 3,
    )
    tab = pack_instances(inst)
    mat_albedo = jnp.asarray(np.array(
        [[0.8, 0.5, 0.3], [0.4, 0.7, 0.5], [0.5, 0.5, 0.8]], np.float32))
    light = jnp.asarray([6.0, 2.0, 8.0])
    cam = jnp.zeros(3)

    @jax.jit
    def orbit(yaws):
        def frame(i, acc):
            img = render_instanced_phong(
                tab, cs, inst.mat, mat_albedo, cam, yaws[i] + 0.0 * acc,
                light, width=width, height=height, shadows=True)
            # consume a FULL-FRAME reduction: slicing one pixel would let
            # XLA fuse the Blinn/Phong math down to a single element
            return acc + jnp.mean(img)

        return lax.fori_loop(0, yaws.shape[0], frame, jnp.float32(0.0))

    def go(seed):
        yaws = jnp.asarray(
            np.linspace(0, 0.5, frames) + seed, jnp.float32)
        return (orbit(yaws),)

    _timed(go, [0.0])  # compile
    dt = _timed(go, [0.0, 0.01, 0.02]) / frames
    results["config5_instanced_1M_orbit"] = {
        "triangles": int(inst.total_triangles),
        "instances": int(inst.num_instances),
        "resolution": f"{width}x{height}",
        "frame_ms": round(dt * 1e3, 1),
        "fps": round(1.0 / dt, 1),
        "note": "Blinn/Phong shaded + hard shadows, chained orbit frames (attrs-emitting Pallas instanced cluster kernel)",
    }


def config5_soft_shadows(results, width=1920, height=1088, frames=4):
    """Config-5 soft-shadow orbit: area light (radius>0), 4 shadow samples
    per pixel — the round-2 claim that was never measured (VERDICT item 5).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from raytracing_engine_tpu.accel import build_bvh, torus_knot
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import grid_instances
    from raytracing_engine_tpu.models.instanced import render_instanced_phong
    from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
        pack_instances,
    )

    mesh = torus_knot(segments=550, sides=32)
    bvh = build_bvh(mesh)
    cs = build_clusters(mesh)
    inst = grid_instances(
        bvh, nx=6, ny=5, spacing=4.0, base=(0.0, 14.0, 0.0),
        mats=np.arange(30, dtype=np.int32) % 3,
    )
    tab = pack_instances(inst)
    mat_albedo = jnp.asarray(np.array(
        [[0.8, 0.5, 0.3], [0.4, 0.7, 0.5], [0.5, 0.5, 0.8]], np.float32))
    light = jnp.asarray([6.0, 2.0, 8.0])
    cam = jnp.zeros(3)

    @jax.jit
    def orbit(yaws):
        def frame(i, acc):
            img = render_instanced_phong(
                tab, cs, inst.mat, mat_albedo, cam, yaws[i] + 0.0 * acc,
                light, width=width, height=height, shadows=True,
                light_radius=1.5, shadow_samples=4)
            return acc + jnp.mean(img)

        return lax.fori_loop(0, yaws.shape[0], frame, jnp.float32(0.0))

    def go(seed):
        yaws = jnp.asarray(np.linspace(0, 0.5, frames) + seed, jnp.float32)
        return (orbit(yaws),)

    _timed(go, [0.0])  # compile
    dt = _timed(go, [0.0, 0.01, 0.02]) / frames
    results["config5_soft_shadow_orbit"] = {
        "triangles": int(inst.total_triangles),
        "resolution": f"{width}x{height}",
        "light_radius": 1.5,
        "shadow_samples": 4,
        "frame_ms": round(dt * 1e3, 1),
        "fps": round(1.0 / dt, 1),
        "note": "Blinn/Phong + area-light soft shadows (4 jittered any-hit "
                "launches), chained orbit frames",
    }


def config5pt_instanced(results, size=512):
    """Path-traced instanced scene (1M tris, 2-bounce+NEE) — the two-level
    megakernel (round-3 capability; VERDICT item 2 bench row)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from raytracing_engine_tpu.accel import build_bvh, torus_knot
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import (
        grid_instances,
        make_instanced_clusters,
    )
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_rebin
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

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
    cfg = PTConfig(width=size, height=size, max_bounces=2, rng="pcg")
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)
    nrays = {}

    def frame(z):
        # rebin engine over the two-level scene: chip A/B (benchmarks/
        # ab_instanced_rebin.json) mega 445.3 -> rebin 343.2 ms (-22.9%)
        # — the 1M-tri bounce sweeps are even sparser than config 3's,
        # so the between-bounce dead-lane compaction pays more
        img, nr = render_pt_rebin(cfg, scene, jnp.array([0.0, 0.0, z]),
                                  quat, 1, key, bvh=ic, tile=(32, 128))
        nrays["n"] = nr
        return img

    _timed(lambda z: (frame(z),), [5e-3])  # ray count (outside jit)
    n_rays = float(nrays["n"])
    dt = _chained(frame, frames=2)
    results["config5pt_instanced_1M_pt"] = {
        "triangles": int(inst.total_triangles),
        "instances": int(inst.num_instances),
        "resolution": size,
        "frame_ms": round(dt * 1e3, 1),
        "mrays": round(n_rays / dt / 1e6, 2),
        "note": "full NEE+MIS bounce loop in-kernel over the two-level "
                "scene (KernelInstances) via the rebin engine "
                "(ab_instanced_rebin.json A/B), area-light sphere, "
                "chained frames",
    }


def headline(results):
    import bench

    mrays, dt = bench.bench_conemarch()
    results["headline_1080p_conemarch"] = {
        "frame_ms": round(dt * 1e3, 2),
        "mrays": round(mrays, 1),
        "vs_target_500": round(mrays / 500.0, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")

    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "results.json"))
    args = ap.parse_args()

    results = {}
    config1_parity(results)
    print(json.dumps(results, indent=2), flush=True)
    config2_spheres(results)
    print(json.dumps(results, indent=2), flush=True)
    config3_bvh(results, size=256 if args.quick else 512)
    print(json.dumps(results, indent=2), flush=True)
    config4_progressive(results, spp=128 if args.quick else 1024)
    print(json.dumps(results, indent=2), flush=True)
    if not args.quick:
        # (the old gather-based two-level traversal crashed the TPU worker;
        # this now runs the Pallas instanced cluster kernel, which is safe)
        for fn, name in ((config3_1080p, "config3_70ktri_bvh_1080p"),
                         (config5_instanced, "config5_instanced_1M_orbit"),
                         (config5_soft_shadows, "config5_soft_shadow_orbit"),
                         (config5pt_instanced, "config5pt_instanced_1M_pt")):
            try:
                fn(results)
            except Exception as e:  # stretch configs — report, don't abort
                results[name] = {"error": str(e)}
            print(json.dumps(results, indent=2), flush=True)
    headline(results)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))

    # append-only dated history + drift vs the previous full run (results
    # .json alone can't distinguish regression from noise — see history.py)
    from history import append_history, drift_lines, last_record

    prev = last_record("run_all")
    append_history("run_all", {"quick": args.quick, "results": results})
    print("\ndrift vs last run_all record"
          + (f" ({prev['ts']}, {prev['git']})" if prev else "") + ":")
    for line in drift_lines(prev.get("results") if prev else None, results):
        print("  " + line)

    print("\n| config | result |")
    print("|---|---|")
    for k, v in results.items():
        print(f"| {k} | {json.dumps(v)} |")


if __name__ == "__main__":
    main()

"""On-chip A/B: per-instance object-space super visit orders (config 5).

The instanced sweeps run the base mesh's cluster hierarchy in OBJECT
space, where the previous identity super order forfeits the near-to-far
t-shrink that visit orders buy the single-mesh path (-7% there). This
script times the two instanced paths with

  mode=identity   per-instance order rows forced to identity (the prior
                  behavior, reproduced by patching accel.clusters.
                  visit_orders — same kernel signature, same SMEM shapes)
  mode=orders     real per-instance object-space orders (the new default)

Run each mode in its OWN process (jit caches key on shapes, not on the
patched function) and compare same-day numbers only (tunnel variance):

  python benchmarks/ab_instanced_orders.py identity
  python benchmarks/ab_instanced_orders.py orders
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(mode):
    import jax
    import jax.numpy as jnp

    import raytracing_engine_tpu.accel.clusters as clusters_mod

    if mode == "identity":
        def _identity_orders(cs, origins):
            o = jnp.asarray(origins, jnp.float32)
            s = cs.super_centroid.shape[0]
            return jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :], (o.shape[0], s))

        clusters_mod.visit_orders = _identity_orders

    from raytracing_engine_tpu.accel import build_bvh, torus_knot
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import (
        grid_instances,
        make_instanced_clusters,
    )
    from raytracing_engine_tpu.models.instanced import render_instanced_phong
    from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
        pack_instances,
    )
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene
    from benchmarks.run_all import _chained

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
    cfg = PTConfig(width=512, height=512, max_bounces=2, rng="pcg")
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)

    def pt_frame(z):
        img, _ = render_pt_mega(cfg, scene, jnp.array([0.0, 0.0, z]), quat,
                                1, key, bvh=ic, tile=(32, 128))
        return img

    pt_ms = _chained(pt_frame, frames=2) * 1e3

    # config-5 phong orbit frame (hard shadows, 1920x1088)
    tab = pack_instances(inst, np.arange(30, dtype=np.int32) % 3)
    albedo = jnp.array([[0.75, 0.5, 0.3], [0.4, 0.7, 0.5], [0.5, 0.5, 0.8]],
                       jnp.float32)

    def phong_frame(z):
        return render_instanced_phong(
            tab, cs, jnp.arange(30, dtype=jnp.int32) % 3, albedo,
            jnp.array([0.0, -6.0 + z, 4.0]), 0.0,
            jnp.array([10.0, -10.0, 30.0]), shadows=True)

    phong_ms = _chained(phong_frame, frames=2) * 1e3

    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S%z"), "mode": mode,
           "config5pt_ms": round(pt_ms, 1), "config5_phong_ms": round(phong_ms, 1)}
    print(json.dumps(out))
    with open("benchmarks/ab_instanced_orders.json", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "orders")

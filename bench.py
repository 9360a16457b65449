"""Benchmark harness — run on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.json:2): Mrays/s (primary + secondary rays) on the
flagship renderer at 1080p. Baseline target: 500 Mrays/s on 1 chip
(BASELINE.json:5) — vs_baseline = value / 500.

Methodology: K frames with distinct camera quaternions, dependency-chained
INSIDE one jitted lax.fori_loop (frame i+1's input depends on frame i's
output), so neither async dispatch nor host/tunnel latency can hide or
inflate device time. Ray accounting per utils/timing.py: one march per pixel
per pyramid level + one shadow ray per live light per output pixel.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_conemarch(width=1920, height=1088, frames=50):
    import jax
    import jax.numpy as jnp

    from raytracing_engine_tpu.config import RenderConfig
    from raytracing_engine_tpu.models import pallas_renderer
    from raytracing_engine_tpu.scene import default_scene
    from raytracing_engine_tpu.utils.timing import conemarch_ray_count

    cfg = RenderConfig(width=width, height=height)
    scene = default_scene()

    n_obj = int(scene.obj_count)
    n_light = int(scene.light_count)

    @jax.jit
    def run(scene, pos, quats):
        def body(i, acc):
            q = quats[i] * (1.0 + 0.0 * acc)  # chain frames
            img = pallas_renderer.render(cfg, scene, pos, q,
                                         n_obj=n_obj, n_light=n_light)
            return acc + img[0, 0, 0]

        return jax.lax.fori_loop(0, quats.shape[0], body, jnp.float32(0.0))

    def mkquats(seed):
        qs = np.random.default_rng(seed).normal(size=(frames, 4)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        return jnp.asarray(qs)

    pos = jnp.zeros(3, jnp.float32)

    # IMPORTANT: the timed call must use inputs the runtime has never seen
    # (the axon tunnel memoizes repeated identical dispatches), and the
    # result must be FETCHED — blocking alone has been observed unreliable
    # on tunneled backends. The scalar fetch RTT is amortized over `frames`.
    float(run(scene, pos, mkquats(0)))  # compile + warm
    best = float("inf")
    for seed in (1, 2, 3):
        t0 = time.perf_counter()
        float(run(scene, pos, mkquats(seed)))
        best = min(best, (time.perf_counter() - t0) / frames)
    dt = best

    primary, secondary = conemarch_ray_count(cfg, int(scene.light_count))
    return (primary + secondary) / dt / 1e6, dt


def main():
    mrays, frame_s = bench_conemarch()
    print(
        json.dumps(
            {
                "metric": "Mrays/s (primary+secondary), 1080p cone-march renderer (Pallas)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 500.0, 4),
            }
        )
    )
    print(f"# frame time: {frame_s*1e3:.2f} ms @ 1080p", file=sys.stderr)
    # regression gate: append to the dated history and report the delta vs
    # the previous headline (stderr keeps stdout = exactly one JSON line)
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        from history import append_history, last_record

        prev = last_record("headline")
        append_history("headline", {"mrays": round(mrays, 2),
                                    "frame_ms": round(frame_s * 1e3, 3)})
        if prev:
            delta = (mrays - prev["mrays"]) / prev["mrays"] * 100.0
            print(f"# vs last headline ({prev['ts']}, {prev['git']}): "
                  f"{prev['mrays']} -> {mrays:.1f} Mrays/s ({delta:+.1f}%)",
                  file=sys.stderr)
    except Exception as e:  # history must never break the bench contract
        print(f"# history unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()

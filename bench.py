"""Benchmark harness — run on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.json:2): Mrays/s (primary + secondary rays) on the
flagship renderer. Baseline target: 500 Mrays/s @ 1080p on 1 chip
(BASELINE.json:5) — vs_baseline = value / 500.

Ray accounting (utils/timing.py): primary = one march per pixel per pyramid
level (the reference dispatches every level every frame), secondary = one
shadow ray per live light per output pixel.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def bench_conemarch(width=1920, height=1088, frames=20, warmup=3):
    from raytracing_engine_tpu.config import RenderConfig
    from raytracing_engine_tpu.models import conemarch
    from raytracing_engine_tpu.scene import default_scene
    from raytracing_engine_tpu.utils.timing import conemarch_ray_count

    cfg = RenderConfig(width=width, height=height)
    scene = default_scene()
    pos = jnp.zeros((3,), jnp.float32)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)

    render = conemarch.render_jit
    img = jax.block_until_ready(render(cfg, scene, pos, quat))
    for _ in range(warmup):
        img = jax.block_until_ready(render(cfg, scene, pos, quat))

    t0 = time.perf_counter()
    for _ in range(frames):
        img = render(cfg, scene, pos, quat)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / frames

    primary, secondary = conemarch_ray_count(cfg, int(scene.light_count))
    mrays = (primary + secondary) / dt / 1e6
    return mrays, dt


def main():
    mrays, frame_s = bench_conemarch()
    print(
        json.dumps(
            {
                "metric": "Mrays/s (primary+secondary), 1080p cone-march renderer",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 500.0, 4),
            }
        )
    )
    print(f"# frame time: {frame_s*1e3:.2f} ms @ 1080p", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Pallas renderer — the TPU-native flagship pipeline.

Same math as models/conemarch.py (and the golden reference), but the hot
loops run in Pallas kernels with per-tile convergence (ops/pallas/). The
pyramid driver mirrors the reference's per-level dispatch loop
(src/main.rs:300-316); the 2x seed upsample between levels is a cheap XLA
gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raytracing_engine_tpu.config import RenderConfig
from raytracing_engine_tpu.ops.pallas.depth import depth_level_pallas, upsample_seed
from raytracing_engine_tpu.ops.pallas.shade import shade_pallas


def render_depth_pyramid(cfg: RenderConfig, scene, cam_pos, cam_quat,
                         interpret=None):
    levels = []
    prev = None
    for i in range(cfg.level_count):
        w, h = cfg.level_dims[i]
        if prev is None:
            seed = jnp.ones((h, w), jnp.float32)
        else:
            seed = upsample_seed(prev, h, w)
        prev = depth_level_pallas(cfg, i, scene, cam_pos, cam_quat, seed,
                                  interpret=interpret)
        levels.append(prev)
    return tuple(levels)


def render(cfg: RenderConfig, scene, cam_pos, cam_quat, interpret=None):
    """Full frame via Pallas kernels → (H, W, 3) float32."""
    depth = render_depth_pyramid(cfg, scene, cam_pos, cam_quat, interpret)[-1]
    return shade_pallas(cfg, scene, cam_pos, cam_quat, depth,
                        interpret=interpret)


@partial(jax.jit, static_argnums=0, static_argnames="interpret")
def render_jit(cfg: RenderConfig, scene, cam_pos, cam_quat, interpret=None):
    return render(cfg, scene, cam_pos, cam_quat, interpret)

"""Multi-chip scaling via jax.sharding Mesh + shard_map."""

from raytracing_engine_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_sharded,
    sharded_render_step,
)

"""Multi-chip scaling via jax.sharding Mesh + shard_map."""

from raytracing_engine_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_sharded,
    sharded_render_step,
)
from raytracing_engine_tpu.parallel.pt_sharding import (  # noqa: F401
    render_pt_sharded,
    sharded_pt_step,
)
from raytracing_engine_tpu.parallel.instanced_sharding import (  # noqa: F401
    render_instanced_sharded,
)

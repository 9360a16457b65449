"""Acceleration structures: triangle meshes + stackless BVH."""

from raytracing_engine_tpu.accel.bvh import BVH, build_bvh, bvh_intersect  # noqa: F401
from raytracing_engine_tpu.accel.mesh import (  # noqa: F401
    icosphere,
    load_obj,
    save_obj,
    smooth_vertex_normals,
    torus_knot,
)

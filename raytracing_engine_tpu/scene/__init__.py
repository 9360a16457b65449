"""SoA scene pytrees."""

from raytracing_engine_tpu.scene.types import Scene, make_scene  # noqa: F401
from raytracing_engine_tpu.scene.default import default_scene  # noqa: F401

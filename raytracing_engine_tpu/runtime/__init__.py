"""Host runtime: frame loop, headless server, checkpointing."""

from raytracing_engine_tpu.runtime.frame import FrameLoop, InputEvent  # noqa: F401
from raytracing_engine_tpu.runtime.serve import render_sequence  # noqa: F401

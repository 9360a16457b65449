"""Host runtime: frame loop, headless server, checkpointing, replay."""

from raytracing_engine_tpu.runtime.frame import FrameLoop, InputEvent  # noqa: F401
from raytracing_engine_tpu.runtime.live import LiveFrameServer  # noqa: F401
from raytracing_engine_tpu.runtime.serve import render_sequence  # noqa: F401
from raytracing_engine_tpu.runtime.replay import (  # noqa: F401
    Recorder,
    load_replay,
    save_replay,
)

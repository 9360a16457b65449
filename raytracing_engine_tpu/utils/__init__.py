"""Host utilities: image/video IO, timing/metrics."""

from raytracing_engine_tpu.utils.image import write_png, to_srgb_u8  # noqa: F401
from raytracing_engine_tpu.utils.timing import FrameStats, Timer  # noqa: F401
from raytracing_engine_tpu.utils.video import (  # noqa: F401
    ApngWriter,
    VideoWriter,
    read_apng,
    read_y4m,
)

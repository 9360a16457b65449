"""Host utilities: image/video IO, timing/metrics."""

from raytracing_engine_tpu.utils.image import (  # noqa: F401
    bloom, tonemap, to_srgb_u8, write_png)
from raytracing_engine_tpu.utils.timing import FrameStats, Timer  # noqa: F401
from raytracing_engine_tpu.utils.video import (  # noqa: F401
    ApngWriter,
    VideoWriter,
    read_apng,
    read_y4m,
)

"""Utilities: latency profiling and checkpointing."""

from fav_tpu.utils.profiling import LatencyStats, StageTimer, profiler_trace  # noqa: F401
from fav_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401

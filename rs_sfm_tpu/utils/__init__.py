"""Utilities: structured logging, profiling timers, checkpointing."""

from rs_sfm_tpu.utils.logging import get_logger
from rs_sfm_tpu.utils.profiling import Timer, stage_timings

from .config import (DEFAULT_BLOCK_COLS, DEFAULT_CONFIG, LANES,
                     MAX_BLOCK_COLS, SUBLANES, SpmvConfig, TILE)
from .timing import PhaseTimer, get_timestamp, maybe_profiler_trace

__all__ = [
    "DEFAULT_BLOCK_COLS", "DEFAULT_CONFIG", "LANES", "MAX_BLOCK_COLS",
    "SUBLANES", "SpmvConfig", "TILE", "PhaseTimer", "get_timestamp",
    "maybe_profiler_trace",
]

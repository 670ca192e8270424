"""Infrastructure: config, checkpointing, summaries, profiling, timing."""

from .config import Config, parse_flags
from .checkpoint import Checkpoint
from .summary import DictSummaryWriter
from .serialization import (
    load_json,
    load_pickle,
    load_yaml,
    run_parallels,
    save_json,
    save_pickle,
    save_yaml,
)
from .timer import Timer

__all__ = ["Config", "parse_flags", "Checkpoint", "DictSummaryWriter",
           "Timer", "save_json", "load_json", "save_yaml", "load_yaml",
           "save_pickle", "load_pickle", "run_parallels"]

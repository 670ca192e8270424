"""Infrastructure: config, checkpointing, summaries, profiling, timing."""

from .config import Config, parse_flags
from .checkpoint import Checkpoint
from .summary import DictSummaryWriter
from .timer import Timer

__all__ = ["Config", "parse_flags", "Checkpoint", "DictSummaryWriter",
           "Timer"]

"""Dict-based TensorBoard summaries (rebuild of tl.summary,
tf2lib/utils/utils.py:34-65): per-tensor mean/std/max/min/sparsity scalars
and histograms, written via tensorboardX."""

from __future__ import annotations

from typing import Mapping

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


class DictSummaryWriter:
    def __init__(self, logdir: str):
        if SummaryWriter is None:  # pragma: no cover
            raise ImportError("tensorboardX required for summaries")
        self._writer = SummaryWriter(logdir)

    def write(self, data: Mapping[str, object], step: int, name: str = "",
              types=("mean",), histogram: bool = False) -> None:
        prefix = f"{name}/" if name else ""
        for key, value in data.items():
            arr = np.asarray(value)
            tag = f"{prefix}{key}"
            if arr.size == 1:
                self._writer.add_scalar(tag, float(arr), step)
                continue
            stats = {
                "mean": np.mean(arr),
                "std": np.std(arr),
                "max": np.max(arr),
                "min": np.min(arr),
                "sparsity": np.mean(arr == 0.0),
            }
            for t in types:
                self._writer.add_scalar(f"{tag}/{t}", float(stats[t]), step)
            if histogram:
                self._writer.add_histogram(f"{tag}/hist", arr, step)

    def flush(self):
        self._writer.flush()

    def close(self):
        self._writer.close()

"""Wall-clock timer context manager (pylib/timer.py capability) plus a
jax.profiler hook for --profile_dir support (SURVEY §5 tracing plan)."""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Context-manager timer: `with Timer() as t: ...; t.elapsed`."""

    def __init__(self, verbose: bool = False, fmt: str = "elapsed {:.6f}s"):
        self.verbose = verbose
        self.fmt = fmt
        self.elapsed = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        if self.verbose:
            print(self.fmt.format(self.elapsed))
        return False


@contextlib.contextmanager
def profile(profile_dir: str | None):
    """jax.profiler trace scope when profile_dir is set, no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax
    with jax.profiler.trace(profile_dir):
        yield

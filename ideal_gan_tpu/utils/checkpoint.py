"""Orbax checkpointing with the reference's checkpoint semantics.

Rebuild of tl.Checkpoint (tf2lib/utils/utils.py:4-31): a manager keeping
max_to_keep=5 checkpoints of an arbitrary pytree (model params, optimizer
states, epoch counter, scalars like the LDM z_std), `restore()` of the
latest on startup (crash-resume), and cross-experiment restore of a subset
by name (the LDM trainer restores the PI-VAE run's encoder/decoders,
train-ldm.py:169).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


class Checkpoint:
    def __init__(self, directory: str | Path, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        """Asynchronous by default (SURVEY §5 TPU plan): the serialized
        write happens on orbax's background thread so the train loop does
        not block on disk. At most one save is in flight — a new save
        first drains the previous one; `close()` (and `restore`) drain
        the last."""
        self._mgr.wait_until_finished()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore into the structure of `state_template`; raises if no
        checkpoint exists."""
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def try_restore(self, state_template: Any):
        """Crash-resume: restore latest if present, else return the
        template unchanged (reference pattern train-sup.py:464-467)."""
        try:
            return self.restore(state_template)
        except FileNotFoundError:
            return state_template

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

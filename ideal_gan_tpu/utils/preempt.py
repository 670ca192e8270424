"""Preemption handling for training loops.

The reference has crash-resume only (restart → restore latest epoch
checkpoint); on preemptible TPU pods that loses up to `epoch_ckpt`
epochs of work. `PreemptionGuard` turns SIGTERM/SIGINT into a graceful
stop: the epoch loop checks `should_stop` each epoch, saves a final
checkpoint, and exits cleanly — the next invocation fast-forwards from
it (SURVEY §5: failure detection / elastic recovery, absent in the
reference).

Usage in a trainer CLI:

    guard = PreemptionGuard()
    for ep in range(start, cfg["epochs"]):
        ...train one epoch...
        if guard.should_stop:
            ckpt.save(ep + 1, jax.device_get(state), wait=True)
            print(f"preempted: checkpointed epoch {ep + 1}, exiting")
            break
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Latches SIGTERM/SIGINT into a should_stop flag (single-shot:
    a second signal falls through to the previous handler so a stuck
    run can still be killed)."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.should_stop = False
        self._previous = {}
        for sig in signals:
            try:
                self._previous[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):
                # not the main thread (tests, notebook kernels) — degrade
                # to a no-op guard
                pass

    def _handler(self, signum, frame):
        self.should_stop = True
        # restore the previous handler: a second signal terminates
        prev = self._previous.get(signum, signal.SIG_DFL)
        try:
            signal.signal(signum, prev)
        except (ValueError, OSError):
            pass

    def restore(self):
        for sig, prev in self._previous.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass

"""Preemption handling (utils/preempt.py + trainer CLI wiring): SIGTERM
mid-training must checkpoint and exit cleanly; the next invocation
resumes from that checkpoint."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


class TestPreemptionGuard:
    def test_latches_signal_without_killing(self):
        from ideal_gan_tpu.utils.preempt import PreemptionGuard
        guard = PreemptionGuard(signals=(signal.SIGUSR1,))
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGUSR1)
        time.sleep(0.05)
        assert guard.should_stop
        guard.restore()

    def test_non_main_thread_degrades_to_noop(self):
        import threading

        from ideal_gan_tpu.utils.preempt import PreemptionGuard
        out = {}

        def make():
            out["guard"] = PreemptionGuard()

        t = threading.Thread(target=make)
        t.start()
        t.join()
        assert out["guard"].should_stop is False  # constructed, inert


@pytest.mark.slow
class TestPreemptedTraining:
    def test_sigterm_checkpoints_and_resume_continues(self, tmp_path):
        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=8",
                   JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO),
                   PYTHONUNBUFFERED="1")
        args = [sys.executable, "-m", "ideal_gan_tpu.cli.train_sup",
                "--dataset", "t-pre", "--synthetic", "16",
                "--data_size", "32", "--n_G_filters", "4",
                "--batch_size", "8", "--epochs", "500",
                "--epoch_ckpt", "100", "--output_base", str(tmp_path)]
        proc = subprocess.Popen(args, cwd=REPO, env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        # wait until training is underway, then preempt
        lines = []
        deadline = time.time() + 600
        started = False
        while time.time() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if line == "" and proc.poll() is not None:
                break
            if line.startswith("epoch 2/"):
                started = True
                break
        if not started:
            proc.kill()
            pytest.fail("trainer never reached epoch 2:\n"
                        + "".join(lines)[-2000:])
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
        lines.append(out)
        full = "".join(lines)
        assert proc.returncode == 0, full[-2000:]
        assert "preempted: checkpointed epoch" in full
        ckdir = tmp_path / "t-pre" / "checkpoints"
        assert ckdir.exists() and any(ckdir.iterdir())

        # resume: must fast-forward past the preemption checkpoint
        resume_args = list(args)
        resume_args[resume_args.index("--epochs") + 1] = "6"
        res = subprocess.run(resume_args, cwd=REPO, env=env,
                             capture_output=True, text=True, timeout=600)
        assert "resumed from epoch" in res.stdout, res.stdout[-2000:]

"""Smoke tests for the example scripts (tiny configs, CPU mesh).

The demo scripts are the round-evidence harnesses
(`examples/aideal_demo.py` produced the −0.02 % PDFF-bias number,
`examples/teaug_demo.py` the TE-robustness numbers) — these tests keep
them importable and runnable end-to-end at toy sizes."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
class TestExampleScripts:
    def test_aideal_demo_tiny(self):
        from examples import aideal_demo
        bias, mae = aideal_demo.main([
            "--n", "8", "--size", "32", "--filters", "4", "--batch", "4",
            "--ep1", "2", "--ep2", "2", "--ep3", "2", "--no-bf16"])
        assert np.isfinite(bias) and np.isfinite(mae)

    def test_teaug_demo_tiny(self):
        from examples import teaug_demo
        results = teaug_demo.main([
            "--n", "8", "--size", "32", "--filters", "4", "--batch", "4",
            "--epochs", "2"])
        for (name, proto), (fm, r2) in results.items():
            assert np.isfinite(fm) and np.isfinite(r2)

    def test_ismrm_challenge_writes_panel(self, tmp_path):
        from examples import ismrm_challenge
        out = tmp_path / "pdff.png"
        ismrm_challenge.main(["--out", str(out)])
        assert out.exists() and out.stat().st_size > 1000

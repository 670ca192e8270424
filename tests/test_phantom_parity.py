"""E2E phantom PDFF parity vs the TF reference (the driver's ±0.5%/vial
accuracy target, BASELINE.json / BASELINE.md).

Synthesizes the multi-vial phantom at the reference GT fat fractions
(ROI-realPhantom.py:321), fits maps with both implementations on identical
inputs, and asserts per-vial |ΔPDFF| ≤ 0.5% for the complex LS path
(get_rho ↔ fit_rho) and the magnitude path (CSE_mag ↔ cse_mag_fit).
Skipped when TF or the reference checkout is unavailable.
"""

import sys
from pathlib import Path

import pytest

pytest.importorskip("tensorflow")
if not Path("/root/reference/wflib").exists():
    pytest.skip("reference checkout unavailable", allow_module_level=True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import phantom_parity  # noqa: E402


@pytest.fixture(scope="module", params=[1.5, 3.0],
                ids=["1p5T", "3T"])
def comparison(request):
    return phantom_parity.compare(field=request.param)


def test_per_vial_pdff_within_half_percent_of_reference(comparison):
    for row in comparison["vials"]:
        ff = row["gt_ff"]
        assert abs(row["complex"]["delta"]) <= 0.005, (
            f"vial GT={ff}: complex-path ΔPDFF "
            f"{row['complex']['delta']:+.5f} exceeds ±0.5%")
        assert abs(row["magnitude"]["delta"]) <= 0.005, (
            f"vial GT={ff}: magnitude-path ΔPDFF "
            f"{row['magnitude']['delta']:+.5f} exceeds ±0.5%")


def test_repo_bias_vs_ground_truth_is_bounded(comparison):
    # The fit itself (not only parity) must track GT at modest noise: the
    # reference's in-vivo display envelope is ±3% PDFF (ROI-analysis.py:482).
    for row in comparison["vials"]:
        assert abs(row["complex"]["repo_bias"]) <= 0.03, (
            f"vial GT={row['gt_ff']}: repo complex-path bias "
            f"{row['complex']['repo_bias']:+.4f} exceeds ±3%")

"""Trainer-level parity vs the TF reference: identical weights + batch ⇒
identical loss and per-parameter gradients for one train step (sup WF and
unsup FM — see tools/model_parity.py for the mechanics)."""

import pytest

tf = pytest.importorskip("tensorflow")

from tools.model_parity import (GRAD_TOL, LOSS_TOL,  # noqa: E402
                                sup_parity, unsup_parity)

pytestmark = pytest.mark.slow


class TestTrainerParity:
    def test_sup_wf_one_step(self):
        r = sup_parity(h=32, nb=2, filters=8)
        assert r["loss_rel_diff"] < LOSS_TOL, r
        assert r["grad_max_rel"] < GRAD_TOL, r

    def test_unsup_fm_one_step(self):
        """The Flax side runs the fused Pallas cycle + custom_vjp — this
        also pins the fused backward against TF end-to-end gradients."""
        r = unsup_parity(h=32, nb=2, filters=8)
        assert r["loss_rel_diff"] < LOSS_TOL, r
        assert r["grad_max_rel"] < GRAD_TOL, r

"""Trainer-level parity vs the TF reference: identical weights + batch ⇒
identical loss and per-parameter gradients for one train step (sup WF,
unsup FM, teaug PM, single bipolar — see tools/model_parity.py for the
mechanics; mag MSE runs in the artifact regeneration only)."""

import pytest

tf = pytest.importorskip("tensorflow")

from tools.model_parity import (GRAD_TOL, LOSS_TOL,  # noqa: E402
                                single_parity, sup_parity, teaug_parity,
                                unsup_parity)

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

    def test_teaug_pm_one_step(self):
        """Pins the B→A physics synthesis, the TE-LSTM→AdaIN conditioned
        VET-Net and the GT-support PM masking (round-4 VERDICT next #5)."""
        r = teaug_parity(h=32, nb=2, filters=8)
        assert r["loss_rel_diff"] < LOSS_TOL, r
        assert r["grad_max_rel"] < GRAD_TOL, r

    def test_single_bipolar_one_step(self):
        """Pins the sep_phase mag/phase cycle incl. the bipolar gradient
        regularizers (round-4 VERDICT next #5)."""
        r = single_parity(h=32, nb=2, filters=8)
        assert r["loss_rel_diff"] < LOSS_TOL, r
        assert r["grad_max_rel"] < GRAD_TOL, r

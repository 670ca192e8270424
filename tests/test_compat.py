"""Reference-API compatibility layer tests."""

import jax.numpy as jnp
import numpy as np

import ideal_gan_tpu.compat as wf
from ideal_gan_tpu import physics as ph
from ideal_gan_tpu.data import layouts

from test_physics import make_maps


class TestCompat:
    def test_constants(self):
        assert wf.ns == 2 and wf.fm_sc == 300.0 and wf.rho_sc == 1.4

    def test_gen_M_return_combinations(self):
        te = wf.gen_TEvar(6, bs=2, orig=True)
        m = wf.gen_M(te, get_Mpinv=False)
        assert m.shape == (2, 6, 2)
        m, m_pinv = wf.gen_M(te)
        assert m_pinv.shape == (2, 2, 6)
        m, p0, m_pinv = wf.gen_M(te, get_P0=True)
        assert p0.shape == (2, 6, 6)
        m, m_pinv, h = wf.gen_M(te, get_H=True)
        assert h.shape == (2, 2, 2)

    def test_acq_to_acq_two_outputs(self):
        maps = make_maps()
        te = wf.gen_TEvar(6, bs=2, orig=True)
        acqs = wf.IDEAL_model(jnp.asarray(maps), [1.5, te])
        rho, recon = wf.acq_to_acq(acqs, jnp.asarray(maps[:, 2:3]), te)
        assert rho.shape == (2, 2, 16, 16, 2)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(acqs),
                                   rtol=2e-2, atol=2e-3)

    def test_get_rho_legacy_layout(self):
        maps = make_maps()
        te = wf.gen_TEvar(6, bs=2, orig=True)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        acqs_leg = layouts.acqs_from_mebcrn(acqs)
        # legacy params (nb, H, W, [R2*, FM])
        pm_leg = np.stack([maps[:, 2, ..., 1], maps[:, 2, ..., 0]],
                          -1).astype(np.float32)
        rho_leg = wf.get_rho(acqs_leg, jnp.asarray(pm_leg), MEBCRN=False,
                             te=te)
        assert rho_leg.shape == (2, 16, 16, 4)
        rho_meb = np.asarray(ph.fit_rho(acqs, jnp.asarray(maps[:, 2:3]), te))
        np.testing.assert_allclose(
            np.asarray(rho_leg),
            np.asarray(layouts.acqs_from_mebcrn(jnp.asarray(rho_meb))),
            rtol=1e-4, atol=1e-5)

    def test_cse_mag_combinations(self):
        rng = np.random.default_rng(0)
        acqs = np.abs(rng.normal(size=(1, 6, 8, 8, 1))).astype(np.float32)
        r2 = rng.uniform(0, 0.4, (1, 1, 8, 8, 1)).astype(np.float32)
        te = wf.gen_TEvar(6, bs=1, orig=True)
        rho, recon = wf.CSE_mag(jnp.asarray(acqs), jnp.asarray(r2), [1.5, te])
        assert rho.shape == (1, 2, 8, 8, 1)
        out = wf.CSE_mag(jnp.asarray(acqs), jnp.asarray(r2), [1.5, te],
                         uncertainty=True, demod_signal=True)
        assert len(out) == 4

    def test_uncertainty_with_dist_objects(self):
        from ideal_gan_tpu.prob import Normal
        maps = make_maps(nb=1, h=8, w=8)
        te = wf.gen_TEvar(6, bs=1, orig=True)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        phi_d = Normal(jnp.asarray(maps[:1, 2:3, ..., :1][:, 0]),
                       jnp.full((1, 8, 8, 1), 1e-3))
        r2_d = Normal(jnp.asarray(np.abs(maps[:1, 2:3, ..., 1:])[:, 0]),
                      jnp.full((1, 8, 8, 1), 1e-3))
        rho, var = wf.PDFF_uncertainty(acqs, phi_d, r2_d, te=te)
        assert rho.shape == (1, 2, 8, 8, 2)
        v = wf.acq_uncertainty(jnp.asarray(maps[:, :2]), phi_d, r2_d, te=te)
        assert v.shape == (1, 6, 8, 8, 2)

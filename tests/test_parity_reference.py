"""Golden parity tests against the original TF reference implementation.

These tests import the reference library (read-only, from /root/reference)
when TensorFlow is available and compare our JAX operators' outputs
numerically. Skipped automatically when the reference or TF is absent, so
the suite stays green in deployment environments.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

wf = pytest.importorskip("wflib")

from ideal_gan_tpu import physics as ph  # noqa: E402
from test_physics import make_maps  # noqa: E402


def _te(ne=6, nb=2):
    te = np.asarray(ph.te_train(ne, bs=nb))
    return te, tf.convert_to_tensor(te, tf.float32)


class TestMatrixParity:
    @pytest.mark.smoke
    def test_gen_M(self):
        te, te_tf = _te()
        m_ref, mpinv_ref = wf.gen_M(te_tf)
        m = np.asarray(ph.model_matrix(jnp.asarray(te)))
        np.testing.assert_allclose(m, m_ref.numpy(), rtol=1e-4, atol=1e-5)
        mpinv = np.asarray(ph.pinv_normal(jnp.asarray(m)))
        np.testing.assert_allclose(mpinv, mpinv_ref.numpy(), rtol=2e-3, atol=2e-4)

    def test_gen_M_P0(self):
        te, te_tf = _te()
        _, p0_ref, _ = wf.gen_M(te_tf, get_P0=True)
        m = ph.model_matrix(jnp.asarray(te))
        p0 = np.asarray(ph.null_projector(m, ph.pinv_normal(m)))
        np.testing.assert_allclose(p0, p0_ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_gen_A(self):
        te, te_tf = _te()
        m_ref = wf.gen_M(te_tf, get_Mpinv=False)
        a_ref, apinv_ref = wf.gen_A(m_ref)
        m = ph.model_matrix(jnp.asarray(te))
        a, a_pinv = ph.mag_design_matrix(m)
        np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a_pinv), apinv_ref.numpy(),
                                   rtol=5e-3, atol=5e-3)

    def test_eigenvals(self):
        rng = np.random.default_rng(0)
        abc = rng.uniform(0.1, 1.0, (2, 64, 3)).astype(np.float32)
        est_ref, unc_ref = wf.eigenvals(tf.convert_to_tensor(abc))
        est, unc = ph.eigenvals_2x2(jnp.asarray(abc))
        np.testing.assert_allclose(np.asarray(est), est_ref.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(unc), unc_ref.numpy(),
                                   rtol=1e-2, atol=1e-3)


class TestOperatorParity:
    def test_ideal_model_forward(self):
        maps = make_maps()
        te, te_tf = _te()
        out_ref = wf.IDEAL_model(tf.convert_to_tensor(maps), [1.5, te_tf])
        out = ph.synthesize(jnp.asarray(maps), jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_ideal_model_forward_bipolar(self):
        maps = make_maps(bipolar=True)
        te, te_tf = _te()
        out_ref = wf.IDEAL_model(tf.convert_to_tensor(maps), [1.5, te_tf])
        out = ph.synthesize(jnp.asarray(maps), jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=1e-3, atol=1e-4)

    @pytest.mark.smoke
    def test_acq_to_acq(self):
        maps = make_maps()
        te, te_tf = _te()
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps), jnp.asarray(te)))
        params = maps[:, 2:3]
        out_ref = wf.acq_to_acq(tf.convert_to_tensor(acqs),
                                tf.convert_to_tensor(params), te=te_tf)
        out = ph.cycle(jnp.asarray(acqs), jnp.asarray(params), jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=2e-3, atol=2e-4)

    def test_get_rho(self):
        maps = make_maps()
        te, te_tf = _te()
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps), jnp.asarray(te)))
        params = maps[:, 2:3]
        out_ref = wf.get_rho(tf.convert_to_tensor(acqs),
                             tf.convert_to_tensor(params), te=te_tf)
        out = ph.fit_rho(jnp.asarray(acqs), jnp.asarray(params), jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=2e-3, atol=2e-4)

    def test_get_rho_phase_constraint(self):
        maps = make_maps()
        te, te_tf = _te()
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps), jnp.asarray(te)))
        params = maps[:, 2:3]
        out_ref = wf.get_rho(tf.convert_to_tensor(acqs),
                             tf.convert_to_tensor(params), te=te_tf,
                             phase_constraint=True)
        out = ph.fit_rho(jnp.asarray(acqs), jnp.asarray(params),
                         jnp.asarray(te), phase_constraint=True)
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=5e-3, atol=5e-4)

    def test_ideal_mag(self):
        rng = np.random.default_rng(7)
        nb, h, w = 1, 8, 8
        row0 = np.stack([rng.uniform(0, 0.6, (nb, h, w)),
                         np.zeros((nb, h, w))], -1)
        row1 = np.stack([rng.uniform(0.3, 0.9, (nb, h, w)),
                         rng.uniform(0, 0.4, (nb, h, w))], -1)
        row2 = np.stack([rng.uniform(-0.2, 0.2, (nb, h, w)),
                         rng.uniform(-0.2, 0.2, (nb, h, w))], -1)
        maps = np.stack([row0, row1, row2], 1).astype(np.float32)
        te, te_tf = _te(nb=nb)
        out_ref = wf.IDEAL_mag(tf.convert_to_tensor(maps), [1.5, te_tf])
        out = ph.synthesize_mag(jnp.asarray(maps), jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_ideal_mag_phase(self):
        rng = np.random.default_rng(8)
        nb, h, w = 1, 8, 8
        row0 = np.stack([rng.uniform(0.1, 0.8, (nb, h, w)),
                         rng.uniform(0.1, 0.8, (nb, h, w)),
                         rng.uniform(0.0, 0.3, (nb, h, w)),
                         np.zeros((nb, h, w))], -1)
        row1 = np.stack([rng.uniform(-0.1, 0.1, (nb, h, w)),
                         rng.uniform(-0.1, 0.1, (nb, h, w)),
                         rng.uniform(-0.2, 0.2, (nb, h, w)),
                         rng.uniform(-0.1, 0.1, (nb, h, w))], -1)
        maps = np.stack([row0, row1], 1).astype(np.float32)
        te, te_tf = _te(nb=nb)
        out_ref = wf.IDEAL_mag_phase(tf.convert_to_tensor(maps), [1.5, te_tf])
        out = ph.synthesize_mag_phase(jnp.asarray(maps), jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=1e-3, atol=1e-4)

    @pytest.mark.smoke
    def test_cse_mag(self):
        rng = np.random.default_rng(9)
        nb, ne, h, w = 1, 6, 8, 8
        te, te_tf = _te(ne=ne, nb=nb)
        acqs = np.abs(rng.normal(size=(nb, ne, h, w, 1))).astype(np.float32)
        out_maps = rng.uniform(0, 0.5, (nb, 1, h, w, 1)).astype(np.float32)
        rho_ref, recon_ref = wf.CSE_mag(tf.convert_to_tensor(acqs),
                                        tf.convert_to_tensor(out_maps),
                                        [1.5, te_tf])
        res = ph.cse_mag_fit(jnp.asarray(acqs), jnp.asarray(out_maps),
                             jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(res.rho), rho_ref.numpy(),
                                   rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(res.recon), recon_ref.numpy(),
                                   rtol=5e-3, atol=5e-4)

    def test_acq_uncertainty(self):
        class FakeDist:
            def __init__(self, m, v):
                self._m, self._v = m, v
            def mean(self):
                return tf.convert_to_tensor(self._m)
            def variance(self):
                return tf.convert_to_tensor(self._v)

        maps = make_maps()
        te, te_tf = _te()
        rho_maps = maps[:, :2]
        phi_m = maps[:, 2, ..., 0].astype(np.float32)
        r2_m = np.abs(maps[:, 2, ..., 1]).astype(np.float32)
        phi_v = np.full_like(phi_m, 1e-4)
        r2_v = np.full_like(r2_m, 1e-4)
        # The reference expects posterior arrays with a trailing channel
        # axis (UNet-head shaped, (nb, H, W, 1)).
        ref = wf.acq_uncertainty(tf.convert_to_tensor(rho_maps),
                                 FakeDist(phi_m[..., None], phi_v[..., None]),
                                 FakeDist(r2_m[..., None], r2_v[..., None]),
                                 ne=6, te=te_tf)
        got = ph.acq_uncertainty(jnp.asarray(rho_maps),
                                 ph.Posterior(jnp.asarray(phi_m), jnp.asarray(phi_v)),
                                 ph.Posterior(jnp.asarray(r2_m), jnp.asarray(r2_v)),
                                 jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-3, atol=1e-5)

    @pytest.mark.smoke
    def test_pdff_uncertainty(self):
        class FakeDist:
            def __init__(self, m, v):
                self._m, self._v = m, v
            def mean(self):
                return tf.convert_to_tensor(self._m)
            def variance(self):
                return tf.convert_to_tensor(self._v)

        maps = make_maps(nb=1, h=8, w=8)
        te, te_tf = _te(nb=1)
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps), jnp.asarray(te)))
        phi_m = maps[:, 2, ..., 0].astype(np.float32)
        r2_m = np.abs(maps[:, 2, ..., 1]).astype(np.float32)
        phi_v = np.full_like(phi_m, 1e-4)
        r2_v = np.full_like(r2_m, 1e-4)
        rho_ref, var_ref = wf.PDFF_uncertainty(
            tf.convert_to_tensor(acqs), FakeDist(phi_m, phi_v),
            FakeDist(r2_m, r2_v), te=te_tf)
        rho, var = ph.pdff_uncertainty(
            jnp.asarray(acqs),
            ph.Posterior(jnp.asarray(phi_m), jnp.asarray(phi_v)),
            ph.Posterior(jnp.asarray(r2_m), jnp.asarray(r2_v)),
            jnp.asarray(te))
        np.testing.assert_allclose(np.asarray(rho), rho_ref.numpy(),
                                   rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(np.asarray(var), var_ref.numpy(),
                                   rtol=1e-2, atol=1e-4)


class TestFAParity:
    def test_fa_gen_M(self):
        fa = pytest.importorskip("falib")
        te_np = np.asarray(ph.te_train(12, bs=1))
        # reference FA gen_M consumes a (ne, 1) TE column
        m_ref = fa.gen_M(tf.convert_to_tensor(te_np[0], tf.float32),
                         get_Mpinv=False)
        m = np.asarray(ph.model_matrix(jnp.asarray(te_np),
                                       species=ph.FATTY_ACID_9PEAK))
        np.testing.assert_allclose(m[0], m_ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_fa_get_rho(self):
        fa = pytest.importorskip("falib")
        rng = np.random.default_rng(0)
        nb, ne, h, w = 1, 12, 8, 8
        te_np = np.asarray(ph.te_train(ne, bs=nb))
        acqs = rng.normal(size=(nb, ne, h, w, 2)).astype(np.float32)
        params = rng.uniform(-0.2, 0.2, (nb, h, w, 2)).astype(np.float32)
        out_ref = fa.get_rho(tf.convert_to_tensor(acqs),
                             tf.convert_to_tensor(params),
                             tf.convert_to_tensor(te_np, tf.float32))
        out = ph.fa_get_rho(jnp.asarray(acqs), jnp.asarray(params),
                            jnp.asarray(te_np))
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                                   rtol=5e-3, atol=5e-3)

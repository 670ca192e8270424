"""Golden tests for the IDEAL physics core against numpy oracles.

The oracles re-derive the reference math (wflib/IDEAL_model.py) directly in
numpy — modeling matrix from the published fat spectrum, pinv via
np.linalg.pinv, eigen-decomposition via np.linalg.eigh — so the JAX
implementation is validated independently of its own code paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import physics as ph

RNG = np.random.default_rng(0)


def np_model_matrix(te, field=1.5):
    """Numpy oracle for the 7-peak water/fat modeling matrix."""
    f_p = np.array([0., -3.80, -3.40, -2.60, -1.94, -0.39, 0.60]) * 1e-6 * 42.58e6 * field
    a_p = np.array([[1.0, 0.0], [0.0, 0.087], [0.0, 0.693], [0.0, 0.128],
                    [0.0, 0.004], [0.0, 0.039], [0.0, 0.048]])
    te = np.asarray(te, np.float64).reshape(te.shape[0], -1)  # (nb, ne)
    phase = np.exp(2j * np.pi * te[..., None] * f_p[None, None, :])
    return phase @ a_p  # (nb, ne, ns)


def make_maps(nb=2, h=16, w=16, seed=1, bipolar=False):
    rng = np.random.default_rng(seed)
    water = rng.uniform(0.1, 0.7, (nb, h, w)) * np.exp(1j * rng.uniform(-1, 1, (nb, h, w)))
    fat = rng.uniform(0.0, 0.5, (nb, h, w)) * np.exp(1j * rng.uniform(-1, 1, (nb, h, w)))
    phi = rng.uniform(-0.3, 0.3, (nb, h, w))     # normalized field map
    r2s = rng.uniform(0.0, 0.5, (nb, h, w))      # normalized R2*
    rows = [
        np.stack([water.real, water.imag], -1),
        np.stack([fat.real, fat.imag], -1),
        np.stack([phi, r2s], -1),
    ]
    if bipolar:
        pb = rng.uniform(-0.2, 0.2, (nb, h, w))
        rows.append(np.stack([pb, np.zeros_like(pb)], -1))
    return np.stack(rows, axis=1).astype(np.float32)  # (nb, nm, h, w, 2)


class TestMatrices:
    def test_model_matrix_vs_numpy(self):
        te = np.asarray(ph.te_train(6, bs=3))
        m = np.asarray(ph.model_matrix(jnp.asarray(te)))
        m_np = np_model_matrix(te)
        np.testing.assert_allclose(m, m_np, rtol=2e-5, atol=2e-5)

    def test_model_matrix_3T(self):
        te = np.asarray(ph.te_train_for_field(6, bs=1, field=3.0))
        assert abs(te[0, 0, 0] - 0.879e-3) < 1e-9
        assert abs((te[0, 1, 0] - te[0, 0, 0]) - 0.6623e-3) < 1e-9
        m = np.asarray(ph.model_matrix(jnp.asarray(te), field=3.0))
        np.testing.assert_allclose(m, np_model_matrix(te, field=3.0),
                                   rtol=2e-5, atol=2e-5)

    def test_pinv_vs_numpy(self):
        te = ph.te_train(6, bs=2)
        m = ph.model_matrix(te)
        m_pinv = np.asarray(ph.pinv_normal(m))
        oracle = np.stack([np.linalg.pinv(np.asarray(m)[i]) for i in range(2)])
        np.testing.assert_allclose(m_pinv, oracle, rtol=1e-4, atol=1e-5)

    def test_pinv_fa_model(self):
        te = ph.te_train(12, bs=1)
        m = ph.model_matrix(te, species=ph.FATTY_ACID_9PEAK)
        assert m.shape == (1, 12, 5)
        m_pinv = np.asarray(ph.pinv_normal(m))
        oracle = np.linalg.pinv(np.asarray(m)[0])
        np.testing.assert_allclose(m_pinv[0], oracle, rtol=5e-3, atol=5e-4)

    def test_null_projector(self):
        te = ph.te_train(6, bs=2)
        m = ph.model_matrix(te)
        p0 = np.asarray(ph.null_projector(m, ph.pinv_normal(m)))
        # P0 annihilates span(M) and is Hermitian + idempotent.
        np.testing.assert_allclose(p0 @ np.asarray(m), 0, atol=1e-5)
        np.testing.assert_allclose(p0, np.conj(np.swapaxes(p0, -1, -2)), atol=1e-6)
        np.testing.assert_allclose(p0 @ p0, p0, atol=1e-5)

    def test_phase_constraint_matrix_is_near_identity(self):
        te = ph.te_train(6, bs=1)
        m = ph.model_matrix(te)
        h = np.asarray(ph.phase_constraint_matrix(m, ph.pinv_normal(m)))
        np.testing.assert_allclose(h[0], np.eye(2), atol=1e-4)

    def test_mag_design_matrix(self):
        te = ph.te_train(6, bs=1)
        m = ph.model_matrix(te)
        a, a_pinv, ata_pinv = ph.mag_design_matrix(m, gen_ata_pinv=True)
        m_np = np.asarray(m)
        a_oracle = np.concatenate([
            np.abs(m_np[..., :1]), np.real(m_np[..., 1:]),
            np.abs(m_np[..., 1:]) ** 2], axis=-1)
        np.testing.assert_allclose(np.asarray(a), a_oracle, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a_pinv)[0],
                                   np.linalg.pinv(a_oracle[0]),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ata_pinv)[0],
            np.linalg.inv(a_oracle[0].T @ a_oracle[0]), rtol=1e-3, atol=1e-3)

    def test_eigenvals_vs_numpy(self):
        # Build rank-1 PSD matrices xxᵀ packed as (a, b, c) = (x², 2xy, y²).
        xy = RNG.uniform(0.1, 1.0, (64, 2))
        packed = np.stack([xy[:, 0] ** 2, 2 * xy[:, 0] * xy[:, 1], xy[:, 1] ** 2], -1)
        est, ratio = ph.eigenvals_2x2(jnp.asarray(packed, jnp.float32))
        np.testing.assert_allclose(np.abs(np.asarray(est)), xy, rtol=1e-3, atol=1e-3)
        assert np.all(np.asarray(ratio) < 1e-3)

    def test_eigenvals_general_vs_eigh(self):
        abc = RNG.uniform(0.2, 1.0, (32, 3)).astype(np.float32)
        est, ratio = ph.eigenvals_2x2(jnp.asarray(abc))
        for i in range(32):
            a, b, c = abc[i]
            mat = np.array([[a, b / 2], [b / 2, c]])
            w, v = np.linalg.eigh(mat)
            lam_max, lam_min = w[1], w[0]
            expect = np.sqrt(max(lam_max, 0)) * np.abs(v[:, 1])
            np.testing.assert_allclose(np.abs(np.asarray(est[i])), expect,
                                       rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(np.asarray(ratio[i]),
                                       max(lam_min, 0) / lam_max,
                                       rtol=1e-2, atol=1e-3)


class TestOperators:
    def test_synthesize_shapes_and_oracle(self):
        maps = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps), te))
        assert acqs.shape == (2, 6, 16, 16, 2)
        # Numpy oracle for one voxel.
        m = np_model_matrix(np.asarray(te))
        b, y, x = 1, 3, 5
        rho = (maps[b, :2, y, x, 0] + 1j * maps[b, :2, y, x, 1]) * ph.RHO_SC
        phi = maps[b, 2, y, x, 0] * ph.FM_SC
        r2s = max(maps[b, 2, y, x, 1], 0) * ph.R2_SC
        xi = phi + 1j * r2s / (2 * np.pi)
        te_np = np.asarray(te)[b, :, 0]
        s = np.exp(2j * np.pi * te_np * xi) * (m[b] @ rho)
        np.testing.assert_allclose(acqs[b, :, y, x, 0], s.real, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(acqs[b, :, y, x, 1], s.imag, rtol=1e-3, atol=1e-4)

    def test_cycle_idempotent_on_consistent_signal(self):
        """Â = A when A is synthesized by the forward model with the same
        (φ, R2*) passed to the cycle — the physics-loss fixed point."""
        maps = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        params = jnp.asarray(maps[:, 2:3])  # (nb,1,h,w,2) = (φ, R2*)
        acqs_hat = ph.cycle(acqs, params, te)
        np.testing.assert_allclose(np.asarray(acqs_hat), np.asarray(acqs),
                                   rtol=2e-2, atol=2e-3)

    def test_fit_rho_recovers_truth(self):
        maps = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        params = jnp.asarray(maps[:, 2:3])
        rho = np.asarray(ph.fit_rho(acqs, params, te))
        np.testing.assert_allclose(rho, maps[:, :2], rtol=2e-2, atol=2e-3)

    def test_fit_rho_bipolar_roundtrip(self):
        maps = make_maps(bipolar=True)
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        params = jnp.asarray(np.concatenate(
            [maps[:, 2:3]] * 3 + [maps[:, 3:4]], axis=1))  # 4 rows: last = bipolar
        rho = np.asarray(ph.fit_rho(acqs, params, te))
        np.testing.assert_allclose(rho, maps[:, :2], rtol=2e-2, atol=2e-3)

    def test_fit_rho_phase_constraint(self):
        """With a common water/fat phase, the constrained fit recovers it."""
        nb, h, w = 1, 8, 8
        rng = np.random.default_rng(3)
        mag_w = rng.uniform(0.2, 0.7, (nb, h, w))
        mag_f = rng.uniform(0.1, 0.5, (nb, h, w))
        pha = rng.uniform(-1.0, 1.0, (nb, h, w))
        water = mag_w * np.exp(1j * pha)
        fat = mag_f * np.exp(1j * pha)
        phi = rng.uniform(-0.2, 0.2, (nb, h, w))
        r2s = rng.uniform(0.0, 0.4, (nb, h, w))
        maps = np.stack([
            np.stack([water.real, water.imag], -1),
            np.stack([fat.real, fat.imag], -1),
            np.stack([phi, r2s], -1)], axis=1).astype(np.float32)
        te = ph.te_train(6, bs=nb)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        rho = np.asarray(ph.fit_rho(acqs, jnp.asarray(maps[:, 2:3]), te,
                                    phase_constraint=True))
        got = rho[:, :, :, :, 0] + 1j * rho[:, :, :, :, 1]
        np.testing.assert_allclose(np.abs(got[:, 0]), mag_w, rtol=5e-2, atol=5e-3)
        np.testing.assert_allclose(np.abs(got[:, 1]), mag_f, rtol=5e-2, atol=5e-3)

    def test_fit_rho_acq_demod(self):
        maps = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        rho, demod = ph.fit_rho(acqs, jnp.asarray(maps[:, 2:3]), te,
                                acq_demod=True)
        assert demod.shape == (2, 6, 16, 16, 2)
        # Demodulated signal should equal M @ rho * rho_sc (no phasor).
        m = np.asarray(ph.model_matrix(te))
        rho_c = np.asarray(rho)[..., 0] + 1j * np.asarray(rho)[..., 1]
        expect = np.einsum('bes,bshw->behw', m, rho_c * ph.RHO_SC)
        got = np.asarray(demod)[..., 0] + 1j * np.asarray(demod)[..., 1]
        np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-3)

    def test_cse_mag_fit_recovers_magnitudes(self):
        nb, h, w, ne = 2, 12, 12, 6
        rng = np.random.default_rng(5)
        mag_w = rng.uniform(0.3, 0.9, (nb, h, w)).astype(np.float32)
        mag_f = rng.uniform(0.05, 0.6, (nb, h, w)).astype(np.float32)
        r2s = rng.uniform(0.05, 0.4, (nb, h, w)).astype(np.float32)
        te = ph.te_train(ne, bs=nb)
        m = np.asarray(ph.model_matrix(te))
        # Magnitude signal: |S| = exp(-te·r2s)·|W·M_w + F·M_f| with zero phase.
        rho = np.stack([mag_w, mag_f], 1) * ph.RHO_SC  # (nb,2,h,w)
        s = np.einsum('bes,bshw->behw', m, rho.astype(np.complex64))
        te_np = np.asarray(te)[..., 0]  # (nb, ne)
        decay = np.exp(-te_np[:, :, None, None] * r2s[:, None] * ph.R2_SC)
        s_mag = np.abs(s) * decay
        acqs = jnp.asarray(s_mag[..., None].astype(np.float32))
        out_maps = jnp.asarray(r2s[:, None, :, :, None].astype(np.float32))
        res = ph.cse_mag_fit(acqs, out_maps, te)
        got = np.asarray(res.rho)[:, :, :, :, 0]
        np.testing.assert_allclose(got[:, 0], mag_w, rtol=5e-2, atol=1e-2)
        np.testing.assert_allclose(got[:, 1], mag_f, rtol=1e-1, atol=2e-2)
        # Reconstruction matches input magnitudes.
        np.testing.assert_allclose(np.asarray(res.recon)[..., 0], s_mag,
                                   rtol=5e-2, atol=1e-2)
        assert np.all(np.asarray(res.uncertainty) < 0.1)

    def test_synthesize_mag_matches_complex_forward(self):
        """The (FF, PD, phase) parameterization must produce the same signal
        as the complex parameterization for equivalent maps."""
        nb, h, w = 1, 8, 8
        rng = np.random.default_rng(7)
        ff = rng.uniform(0.0, 0.6, (nb, h, w)).astype(np.float32)
        pd = rng.uniform(0.3, 0.9, (nb, h, w)).astype(np.float32)
        r2s = rng.uniform(0.0, 0.4, (nb, h, w)).astype(np.float32)
        pha = rng.uniform(-0.2, 0.2, (nb, h, w)).astype(np.float32)
        phi = rng.uniform(-0.2, 0.2, (nb, h, w)).astype(np.float32)
        zeros = np.zeros_like(ff)
        mag_maps = np.stack([
            np.stack([ff, zeros], -1),
            np.stack([pd, r2s], -1),
            np.stack([pha, phi], -1)], 1).astype(np.float32)
        te = ph.te_train(6, bs=nb)
        out_mag = ph.synthesize_mag(jnp.asarray(mag_maps), te)
        # Equivalent complex maps.
        common = np.exp(1j * pha * 4 * np.pi)
        water = (1 - ff) * pd * common
        fat = ff * pd * common
        cplx_maps = np.stack([
            np.stack([water.real, water.imag], -1),
            np.stack([fat.real, fat.imag], -1),
            np.stack([phi, r2s], -1)], 1).astype(np.float32)
        out_cplx = ph.synthesize(jnp.asarray(cplx_maps), te)
        np.testing.assert_allclose(np.asarray(out_mag), np.asarray(out_cplx),
                                   rtol=1e-3, atol=1e-4)

    def test_synthesize_mag_phase_roundtrip(self):
        nb, h, w = 1, 8, 8
        rng = np.random.default_rng(9)
        mags = rng.uniform(0.1, 0.8, (nb, h, w, 2)).astype(np.float32)
        phas = rng.uniform(-0.1, 0.1, (nb, h, w, 2)).astype(np.float32)
        r2s = rng.uniform(0.0, 0.3, (nb, h, w)).astype(np.float32)
        phi = rng.uniform(-0.2, 0.2, (nb, h, w)).astype(np.float32)
        pbip = np.zeros((nb, h, w), np.float32)
        row0 = np.concatenate([mags, r2s[..., None], np.zeros_like(r2s)[..., None]], -1)
        row1 = np.concatenate([phas, phi[..., None], pbip[..., None]], -1)
        maps = np.stack([row0, row1], 1)
        te = ph.te_train(6, bs=nb)
        acqs = ph.synthesize_mag_phase(jnp.asarray(maps), te)
        # Fit back with known (φ, R2*) and compare magnitudes.
        params = np.stack([np.stack([phi, r2s], -1)], 1).astype(np.float32)
        rho = np.asarray(ph.fit_rho(acqs, jnp.asarray(params), te))
        got_mag = np.abs(rho[..., 0] + 1j * rho[..., 1])
        np.testing.assert_allclose(got_mag[:, 0], mags[..., 0], rtol=3e-2, atol=3e-3)
        np.testing.assert_allclose(got_mag[:, 1], mags[..., 1], rtol=3e-2, atol=3e-3)


class TestUncertainty:
    def test_pdff_uncertainty_zero_variance_matches_fit(self):
        maps = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        phi = ph.Posterior(jnp.asarray(maps[:, 2, ..., 0]),
                           jnp.full(maps[:, 2, ..., 0].shape, 1e-12))
        r2s = ph.Posterior(jnp.asarray(maps[:, 2, ..., 1]),
                           jnp.full(maps[:, 2, ..., 1].shape, 1e-12))
        rho, rho_var = ph.pdff_uncertainty(acqs, phi, r2s, te)
        assert rho.shape == (2, 2, 16, 16, 2)
        assert rho_var.shape == (2, 4, 16, 16, 1)
        plain = np.asarray(ph.fit_rho(acqs, jnp.asarray(maps[:, 2:3]), te))
        np.testing.assert_allclose(np.asarray(rho), plain, rtol=5e-2, atol=5e-3)

    def test_pdff_uncertainty_variance_grows(self):
        maps = make_maps()
        te = ph.te_train(6, bs=2)
        acqs = ph.synthesize(jnp.asarray(maps), te)
        mean_phi = jnp.asarray(maps[:, 2, ..., 0])
        mean_r2 = jnp.asarray(maps[:, 2, ..., 1])
        _, var_small = ph.pdff_uncertainty(
            acqs, ph.Posterior(mean_phi, jnp.full(mean_phi.shape, 1e-8)),
            ph.Posterior(mean_r2, jnp.full(mean_r2.shape, 1e-8)), te)
        _, var_big = ph.pdff_uncertainty(
            acqs, ph.Posterior(mean_phi, jnp.full(mean_phi.shape, 1e-3)),
            ph.Posterior(mean_r2, jnp.full(mean_r2.shape, 1e-3)), te)
        assert np.mean(np.asarray(var_big)) > np.mean(np.asarray(var_small))

    def test_acq_uncertainty_shapes_and_monotonicity(self):
        maps = make_maps()
        te = ph.te_train(6, bs=2)
        rho_maps = jnp.asarray(maps[:, :2])
        mean_phi = jnp.asarray(maps[:, 2, ..., 0])
        mean_r2 = jnp.asarray(maps[:, 2, ..., 1])
        v1 = ph.acq_uncertainty(rho_maps,
                                ph.Posterior(mean_phi, jnp.full(mean_phi.shape, 1e-6)),
                                ph.Posterior(mean_r2, jnp.full(mean_r2.shape, 1e-6)),
                                te)
        assert v1.shape == (2, 6, 16, 16, 2)
        v_mag = ph.acq_uncertainty(rho_maps,
                                   ph.Posterior(mean_phi, jnp.full(mean_phi.shape, 1e-6)),
                                   ph.Posterior(mean_r2, jnp.full(mean_r2.shape, 1e-6)),
                                   te, only_mag=True)
        assert v_mag.shape == (2, 6, 16, 16, 1)
        v2 = ph.acq_uncertainty(rho_maps,
                                ph.Posterior(mean_phi, jnp.full(mean_phi.shape, 1e-2)),
                                ph.Posterior(mean_r2, jnp.full(mean_r2.shape, 1e-2)),
                                te)
        assert np.mean(np.asarray(v2)) > np.mean(np.asarray(v1))
        assert np.all(np.asarray(v1) >= 0)


class TestTE:
    def test_te_train_orig(self):
        te = np.asarray(ph.te_train(6, bs=2))
        assert te.shape == (2, 6, 1)
        np.testing.assert_allclose(te[0, :, 0],
                                   1.3e-3 + 2.1e-3 * np.arange(6), rtol=1e-6)

    def test_sample_te_train_bounds(self):
        key = jax.random.PRNGKey(0)
        for i in range(5):
            te = np.asarray(ph.sample_te_train(jax.random.fold_in(key, i), 6, bs=3))
            assert te.shape == (3, 6, 1)
            assert 1.0e-3 <= te[0, 0, 0] <= 2.4e-3 + 1e-6
            dte = np.diff(te[0, :, 0])
            assert np.all(dte > 1.0e-3) and np.all(dte < 2.7e-3)
            np.testing.assert_allclose(te[0], te[1])

    def test_gradients_flow_through_cycle(self):
        """The unsupervised physics loss must be differentiable w.r.t. the
        (φ, R2*) maps (SURVEY §3.2: backward through the LS projection)."""
        maps = make_maps(nb=1, h=8, w=8)
        te = ph.te_train(6, bs=1)
        acqs = ph.synthesize(jnp.asarray(maps), te)

        def loss(params):
            a_hat = ph.cycle(acqs, params, te)
            return jnp.mean((a_hat - acqs) ** 2)

        g = jax.grad(loss)(jnp.asarray(maps[:, 2:3] + 0.05))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0

    def test_gradients_flow_through_synthesize(self):
        maps = jnp.asarray(make_maps(nb=1, h=8, w=8))
        te = ph.te_train(6, bs=1)
        target = ph.synthesize(maps, te)

        def loss(m):
            return jnp.mean((ph.synthesize(m, te) - target) ** 2)

        g = jax.grad(loss)(maps + 0.02)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0

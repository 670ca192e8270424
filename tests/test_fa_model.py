"""Fatty-acid (9-peak, 5-species) model tests."""

import jax.numpy as jnp
import numpy as np

from ideal_gan_tpu import physics as ph


def make_fa_maps(nb=1, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    ns = ph.FATTY_ACID_9PEAK.n_species
    rho = (rng.uniform(0.05, 0.5, (nb, h, w, ns))
           * np.exp(1j * rng.uniform(-0.5, 0.5, (nb, h, w, ns))))
    fm = rng.uniform(-0.2, 0.2, (nb, h, w)).astype(np.float32)
    return rho.astype(np.complex64), fm


class TestFAModel:
    def test_forward_cycle_roundtrip(self):
        rho, fm = make_fa_maps()
        nb, h, w, ns = rho.shape
        ne = 12
        te = ph.te_train(ne, bs=nb)
        # legacy interleaved maps + (R2*, FM)
        rho_leg = np.stack([rho.real, rho.imag], -1).reshape(nb, h, w, 2 * ns)
        params = np.stack([np.zeros_like(fm), fm], -1)
        out_maps = np.concatenate([rho_leg, params], -1).astype(np.float32)
        acqs = ph.fa_forward(jnp.asarray(out_maps), te)
        assert acqs.shape == (nb, h, w, 2 * ne)
        rho_hat, recon = ph.fa_cycle(acqs, jnp.asarray(params), te)
        assert rho_hat.shape == (nb, h, w, 2 * ns)
        # cycle is idempotent on consistent signals
        np.testing.assert_allclose(np.asarray(recon), np.asarray(acqs),
                                   rtol=5e-2, atol=5e-3)
        # species recovered (12 echoes >= 5 species, well-conditioned-ish)
        got = np.asarray(rho_hat)
        got_c = got[..., 0::2] + 1j * got[..., 1::2]
        np.testing.assert_allclose(np.abs(got_c), np.abs(rho), rtol=0.3,
                                   atol=0.05)

    def test_get_rho_mebcrn(self):
        rho, fm = make_fa_maps()
        nb, h, w, ns = rho.shape
        ne = 12
        te = ph.te_train(ne, bs=nb)
        maps = np.concatenate([
            np.stack([rho.real, rho.imag], -1).transpose(0, 3, 1, 2, 4),
            np.stack([fm, np.zeros_like(fm)], -1)[:, None]], axis=1)
        acqs = ph.synthesize(jnp.asarray(maps.astype(np.float32)), te,
                             species=ph.FATTY_ACID_9PEAK)
        params = np.stack([fm, np.zeros_like(fm)], -1).astype(np.float32)
        rho_hat = ph.fa_get_rho(acqs, jnp.asarray(params), te)
        got = np.asarray(rho_hat)[..., 0] + 1j * np.asarray(rho_hat)[..., 1]
        want = rho.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=0.1,
                                   atol=0.02)

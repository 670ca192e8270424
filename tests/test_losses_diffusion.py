"""Losses and diffusion ops tests, incl. parity vs the TF reference when
available."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import losses as L
from ideal_gan_tpu import diffusion as dm

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


class TestAdversarial:
    @pytest.mark.parametrize("mode", ["gan", "hinge_v1", "hinge_v2", "lsgan",
                                      "wgan"])
    def test_shapes_and_signs(self, mode):
        d_fn, g_fn = L.adversarial_losses(mode)
        r = jnp.asarray(RNG.normal(size=(4, 8, 8, 1)).astype(np.float32))
        f = jnp.asarray(RNG.normal(size=(4, 8, 8, 1)).astype(np.float32))
        rl, fl = d_fn(r, f)
        g = g_fn(f)
        assert np.isfinite(float(rl)) and np.isfinite(float(fl))
        assert np.isfinite(float(g))

    def test_wgan_values(self):
        d_fn, g_fn = L.adversarial_losses("wgan")
        r = jnp.full((2, 2), 3.0)
        f = jnp.full((2, 2), 1.0)
        rl, fl = d_fn(r, f)
        assert float(rl) == -3.0 and float(fl) == 1.0
        assert float(g_fn(f)) == -1.0

    def test_gradient_penalty_wgan_gp(self):
        critic = lambda x: jnp.sum(2.0 * x, axis=(1, 2, 3))
        real = jnp.asarray(RNG.normal(size=(4, 4, 4, 1)).astype(np.float32))
        fake = jnp.asarray(RNG.normal(size=(4, 4, 4, 1)).astype(np.float32))
        gp = L.gradient_penalty(critic, real, fake, "wgan-gp", KEY)
        # ∇ critic = 2 everywhere → ‖∇‖ = 2·√16 = 8 → gp = (8−1)² = 49.
        np.testing.assert_allclose(float(gp), 49.0, rtol=1e-4)

    def test_r1(self):
        critic = lambda x: jnp.sum(x ** 2, axis=(1, 2, 3))
        real = jnp.ones((2, 2, 2, 1))
        r1 = L.r1_regularization(critic, real)
        # ∇ = 2x = 2 → Σ 4 over 4 elements = 16.
        np.testing.assert_allclose(float(r1), 16.0, rtol=1e-5)


class TestHeteroscedastic:
    def test_var_mse_matches_reference_formula(self):
        y = RNG.normal(size=(2, 3, 8, 8, 2)).astype(np.float32)
        pred = RNG.normal(size=(2, 3, 8, 8, 4)).astype(np.float32)
        got = float(L.var_mse(jnp.asarray(y), jnp.asarray(pred)))
        var = np.maximum(pred[..., 2:], 1e-5)
        std = np.sqrt(var)
        want = np.mean((y - pred[..., :2]) ** 2 / std + np.log(std))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_var_mse_r2_finite_and_minimized_at_truth(self):
        y = np.abs(RNG.normal(1.0, 0.2, size=(2, 8, 8, 1))).astype(np.float32)
        var = np.full_like(y, 0.04)
        good = float(L.var_mse_r2(jnp.asarray(y),
                                  jnp.asarray(np.concatenate([y, var], -1))))
        bad = float(L.var_mse_r2(jnp.asarray(y),
                                 jnp.asarray(np.concatenate([y + 1.0, var], -1))))
        assert np.isfinite(good) and good < bad

    def test_apd_zero_for_equal_phase(self):
        mag = np.abs(RNG.normal(size=(2, 1, 8, 8, 1))).astype(np.float32)
        pha = RNG.uniform(-0.5, 0.5, size=(2, 1, 8, 8, 1)).astype(np.float32)
        y = jnp.asarray(np.concatenate([mag, pha], -1))
        apd = L.absolute_phase_disparity(y, y)
        np.testing.assert_allclose(np.asarray(apd), 0.0, atol=1e-5)
        y2 = jnp.asarray(np.concatenate([mag, pha + 0.25], -1))
        apd2 = L.absolute_phase_disparity(y, y2)
        np.testing.assert_allclose(np.asarray(apd2), 0.25 * np.pi, rtol=1e-3)

    @pytest.mark.smoke
    def test_tv_matches_tf(self):
        tf = pytest.importorskip("tensorflow")
        img = RNG.normal(size=(3, 8, 8, 2)).astype(np.float32)
        got = np.asarray(L.total_variation_2d(jnp.asarray(img)))
        want = tf.image.total_variation(tf.convert_to_tensor(img)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestDiffusion:
    def test_schedules(self):
        lin = dm.linear_beta_schedule(100)
        cos = dm.cosine_beta_schedule(100)
        for s in (lin, cos):
            assert s.beta.shape == (100,)
            b = np.asarray(s.beta)
            assert np.all(b > 0) and np.all(b < 1)
            np.testing.assert_allclose(np.asarray(s.alpha_bar),
                                       np.cumprod(1 - b), rtol=1e-4,
                                       atol=1e-9)

    def test_forward_noise_statistics(self):
        sched = dm.linear_beta_schedule(100)
        x0 = jnp.ones((8, 4, 4, 1))
        t = jnp.full((8,), 99, jnp.int32)
        noisy, noise = dm.forward_noise(KEY, x0, t, sched)
        assert noisy.shape == x0.shape
        ab = float(sched.alpha_bar[99])
        # signal almost destroyed at t=99
        assert abs(float(jnp.mean(noisy))) < 3 * np.sqrt(1 - ab)

    def test_ddpm_reverse_reduces_noise(self):
        """With a perfect ε-oracle the reverse chain recovers a constant
        image up to the injected variance."""
        sched = dm.linear_beta_schedule(50)

        def denoise_fn(x, t):
            return jnp.zeros_like(x)  # pretend data is pure signal

        out = dm.ddpm_sample(KEY, denoise_fn, (2, 8, 8, 1), sched)
        assert out.shape == (2, 8, 8, 1)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_ddim_sample_runs_strided(self):
        sched = dm.linear_beta_schedule(100)
        calls = []

        def denoise_fn(x, t):
            return 0.1 * x

        out = dm.ddim_sample(KEY, denoise_fn, (1, 8, 8, 2), sched, n_steps=10)
        assert out.shape == (1, 8, 8, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_reverse_step_parity_vs_reference(self):
        tf = pytest.importorskip("tensorflow")
        # the bridge pins TF op determinism at reference load (refload);
        # the reference ddpm draws tf.random.normal (zeroed by β=0 here),
        # which under determinism requires a seed to be legal
        tf.keras.utils.set_random_seed(0)
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        dmref = pytest.importorskip("DMlib")
        T = 50
        sched = dm.linear_beta_schedule(T)
        beta = np.asarray(sched.beta, np.float64)
        alpha = 1 - beta
        alpha_bar = np.cumprod(alpha)
        x_t = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
        eps = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
        t = 17
        ref = dmref.ddpm(tf.convert_to_tensor(x_t), tf.convert_to_tensor(eps),
                         t, alpha, alpha_bar, beta * 0.0).numpy()
        got = np.asarray(dm.ddpm_reverse_step(
            KEY, jnp.asarray(x_t), jnp.asarray(eps), jnp.asarray(t),
            dm.DiffusionSchedule(sched.beta * 0.0, sched.alpha,
                                 sched.alpha_bar)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

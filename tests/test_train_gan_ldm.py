"""PI-VAE/GAN and LDM trainer smoke tests (tiny models, CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import physics as ph
from ideal_gan_tpu.data import ItemPool
from ideal_gan_tpu.train import gan as gan_tr
from ideal_gan_tpu.train import ldm as ldm_tr


def tiny_cfg(**over):
    cfg = dict(gan_tr.DEFAULTS)
    cfg.update(n_G_filters=12, n_downsamplings=2, n_res_blocks=1,
               encoded_size=12, n_D_filters=8, batch_size=2, epochs=2,
               A_loss="pix-wise")
    cfg.update(over)
    return cfg


def mag_phase_batch(nb=2, h=32, w=32, ne=6, seed=0):
    rng = np.random.default_rng(seed)
    ff = rng.uniform(0, 0.6, (nb, h, w)).astype(np.float32)
    pd = rng.uniform(0.3, 0.9, (nb, h, w)).astype(np.float32)
    r2s = rng.uniform(0, 0.4, (nb, h, w)).astype(np.float32)
    pha = rng.uniform(-0.2, 0.2, (nb, h, w)).astype(np.float32)
    phi = rng.uniform(-0.2, 0.2, (nb, h, w)).astype(np.float32)
    zeros = np.zeros_like(ff)
    B = np.stack([
        np.stack([ff, zeros], -1),
        np.stack([pd, r2s], -1),
        np.stack([pha, phi], -1)], 1).astype(np.float32)
    te = ph.te_train(ne, bs=nb)
    A = np.asarray(ph.synthesize_mag(jnp.asarray(B), te))
    return A, B, np.asarray(te)


class TestGANConfig:
    def test_default_encoded_size_is_valid(self):
        """The reference's default encoded_size=256 crashes its own
        tf.split(z, 3) (train-IDEAL-GAN.py:31,234); per SURVEY §7.9 the
        default is fixed and validated — DEFAULTS must construct."""
        assert gan_tr.DEFAULTS["encoded_size"] % 3 == 0
        models = gan_tr.build_models(dict(gan_tr.DEFAULTS))
        assert len(models) == 6

    def test_indivisible_encoded_size_rejected_with_clear_error(self):
        import pytest
        with pytest.raises(ValueError, match="divisible by 3"):
            gan_tr.build_models(tiny_cfg(encoded_size=256))

    def test_per_level_filter_list(self):
        """--n_G_filt_list per-level widths (train-IDEAL-GAN.py:67-68,
        138-145) plumb into encoder/decoders and train."""
        cfg = tiny_cfg(n_G_filt_list="12,16,24")
        models = gan_tr.build_models(cfg)
        assert models[0].filters == (12, 16, 24)        # encoder
        assert models[2].filters == (4, 5, 8)           # dec_mag = //3
        assert models[1].filters == (3, 4, 6)           # dec_ff = //4
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        state, m, _ = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                     jnp.asarray(te)), key)
        assert np.isfinite(float(m["G_loss"]))

    def test_bad_filter_list_length_rejected(self):
        import pytest
        with pytest.raises(ValueError, match="n_downsamplings"):
            gan_tr.build_models(tiny_cfg(n_G_filt_list="12,16"))


class TestGANTrainer:
    @pytest.mark.smoke
    def test_vae_mode_losses_finite_and_decreasing(self):
        cfg = tiny_cfg()
        models = gan_tr.build_models(cfg)
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        losses = []
        for i in range(5):
            state, m, _ = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                         jnp.asarray(te)),
                                 jax.random.fold_in(key, i))
            losses.append(float(m["G_loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_bf16_compute(self):
        # bf16 encoder/decoders; posterior, physics and D stay f32
        cfg = tiny_cfg(bf16=True, adv_train=True)
        models = gan_tr.build_models(cfg)
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        state, m, fake = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                        jnp.asarray(te)), key)
        assert fake.dtype == jnp.float32
        state, dm = d_step(state, jnp.asarray(A), fake)
        assert np.isfinite(float(m["G_loss"]))
        assert np.isfinite(float(dm["D_loss"]))

    def test_vq_mode(self):
        cfg = tiny_cfg(VQ_encoder=True, VQ_num_embed=8)
        models = gan_tr.build_models(cfg)
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        state, m, _ = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                     jnp.asarray(te)), key)
        assert np.isfinite(float(m["G_loss"]))
        assert float(m["VQ_loss"]) > 0

    def test_adversarial_with_pool(self):
        cfg = tiny_cfg(adv_train=True, critic_train_steps=1)
        models = gan_tr.build_models(cfg)
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        pool = ItemPool(pool_size=4, seed=0)
        for i in range(3):
            state, m, fake = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                            jnp.asarray(te)),
                                    jax.random.fold_in(key, i))
            pooled = pool(np.asarray(fake))
            state, dm_ = d_step(state, jnp.asarray(A), jnp.asarray(pooled))
            assert np.isfinite(float(dm_["D_loss"]))
            assert np.isfinite(float(dm_["D_A_r1"]))

    def test_vgg_perceptual_loss_mode(self):
        cfg = tiny_cfg(A_loss="VGG")
        models = gan_tr.build_models(cfg)
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        state, m, _ = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                     jnp.asarray(te)), key)
        assert np.isfinite(float(m["A2B2A_cycle_loss"]))


class TestLDM:
    @pytest.mark.smoke
    def test_train_and_sample(self):
        cfg = dict(ldm_tr.DEFAULTS)
        cfg.update(n_timesteps=8, n_ldm_filters=8, dim_mults=(1, 2),
                   in_res=8, epochs=2, infer_steps=4)
        channels = 6
        model = ldm_tr.build_model(cfg, channels)
        sched = ldm_tr.build_schedule(cfg)
        step_fn, tx = ldm_tr.make_train_step(cfg, model, sched, None)
        key = jax.random.PRNGKey(0)
        state = ldm_tr.init_state(cfg, model, tx, key, (2, 8, 8, channels))
        z = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 8, 8, channels)).astype(np.float32))
        labels = jnp.zeros((2,), jnp.int32)
        def eval_loss(params):
            # fixed (t, noise) evaluation batch — per-step losses are noisy
            t = jnp.full((2,), 4, jnp.int32)
            import ideal_gan_tpu.diffusion as dmm
            z_noisy, noise = dmm.forward_noise(jax.random.PRNGKey(7), z, t,
                                               sched)
            eps = model.apply({"params": params}, z_noisy, t, labels)
            return float(jnp.mean(jnp.square(noise - eps)))

        before = eval_loss(state.params)
        losses = []
        for i in range(8):
            state, m = step_fn(state, (z, labels), jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert eval_loss(state.params) < before
        out = ldm_tr.sample_latents(cfg, model, state.params, sched, key,
                                    n=2, latent_hw=(8, 8), channels=channels,
                                    z_std=1.0)
        assert out.shape == (2, 8, 8, channels)
        assert np.all(np.isfinite(np.asarray(out)))
        out2 = ldm_tr.sample_latents(cfg, model, state.params, sched, key,
                                     n=1, latent_hw=(8, 8), channels=channels,
                                     z_std=1.0, method="ddim")
        assert out2.shape == (1, 8, 8, channels)

    def test_latent_std_single_pass(self):
        """Streaming jitted pre-pass equals the host two-pass computation
        (reference train-ldm.py:277-296) and consumes the dataset once —
        a generator (single-use iterable) must work."""
        rng = np.random.default_rng(0)
        batches = [rng.normal(2.0, 3.0, (4, 5)).astype(np.float32)
                   for _ in range(4)]
        std = ldm_tr.latent_std(lambda a: a, iter(batches))
        # host two-pass oracle (the reference's algorithm)
        allz = np.concatenate(batches).ravel()
        mean = allz.sum() / allz.size
        host_std = np.sqrt(((allz - mean) ** 2).sum() / allz.size)
        np.testing.assert_allclose(std, host_std, rtol=1e-5)
        np.testing.assert_allclose(std, allz.std(), rtol=1e-5)

    def test_generate_dataset(self):
        gan_cfg = tiny_cfg()
        models = gan_tr.build_models(gan_cfg)
        _, _, txs = gan_tr.make_train_steps(gan_cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        gstate = gan_tr.init_state(gan_cfg, models, txs, key, A)

        cfg = dict(ldm_tr.DEFAULTS)
        cfg.update(n_timesteps=4, n_ldm_filters=8, dim_mults=(1, 2),
                   in_res=8, infer_steps=2)
        model = ldm_tr.build_model(cfg, gan_cfg["encoded_size"])
        sched = ldm_tr.build_schedule(cfg)
        _, tx = ldm_tr.make_train_step(cfg, model, sched, None)
        lstate = ldm_tr.init_state(cfg, model, tx, key,
                                   (1, 8, 8, gan_cfg["encoded_size"]))
        acqs, maps = ldm_tr.generate_dataset(
            cfg, gan_cfg, models, gstate.params_g, model, lstate.params,
            sched, key, n_samples=1, latent_hw=(8, 8), z_std=1.0)
        assert acqs.shape == (1, 6, 32, 32, 2)
        assert maps.shape == (1, 3, 32, 32, 2)
        assert np.all(np.isfinite(np.asarray(acqs)))


class TestCGAN:
    def test_cgan_adversarial_path(self):
        cfg = tiny_cfg(adv_train=True, cGAN=True)
        models = gan_tr.build_models(cfg)
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        state, m, fake = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                        jnp.asarray(te)), key)
        assert np.isfinite(float(m["A2B2A_g_loss"]))
        state, dm_ = d_step(state, jnp.asarray(A), jnp.asarray(fake))
        assert np.isfinite(float(dm_["D_loss"]))


class TestGANRegs:
    def test_fourier_and_cov_regs(self):
        cfg = tiny_cfg(Fourier_reg_weight=1e-4, cov_reg_weight=1e-4)
        models = gan_tr.build_models(cfg)
        g_step, d_step, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        state, m, _ = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                     jnp.asarray(te)), key)
        assert np.isfinite(float(m["A2B2A_f_cycle_loss"]))
        assert float(m["A2B2A_f_cycle_loss"]) > 0
        assert np.isfinite(float(m["Cov_reg"]))

    def test_vq_perplexity_reported(self):
        cfg = tiny_cfg(VQ_encoder=True, VQ_num_embed=8)
        models = gan_tr.build_models(cfg)
        g_step, _, txs = gan_tr.make_train_steps(cfg, models)
        A, B, te = mag_phase_batch()
        key = jax.random.PRNGKey(0)
        state = gan_tr.init_state(cfg, models, txs, key, A)
        _, m, _ = g_step(state, (jnp.asarray(A), jnp.asarray(B),
                                 jnp.asarray(te)), key)
        assert 1.0 <= float(m["VQ_perplexity"]) <= 8.0

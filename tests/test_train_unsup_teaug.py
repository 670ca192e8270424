"""AI-DEAL unsupervised and TE-augmentation trainer smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import physics as ph
from ideal_gan_tpu.parallel import data_mesh, shard_batch
from ideal_gan_tpu.train import teaug, unsup

from test_physics import make_maps


def synth_batch(nb=8, h=32, w=32, ne=6):
    maps = np.concatenate([make_maps(nb=nb // 2, h=h, w=w, seed=s)
                           for s in (1, 2)])
    te = ph.te_train(ne, bs=nb)
    acqs = np.asarray(ph.synthesize(jnp.asarray(maps), te))
    return maps, np.asarray(te), acqs


class TestUnsup:
    def _run(self, cfg_over, n_steps=4):
        cfg = dict(unsup.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=2, **cfg_over)
        g_fm, g_r2 = unsup.build_models(cfg)
        maps, te, acqs = synth_batch()
        step_fn, tx = unsup.make_train_step(cfg, g_fm, g_r2)
        key = jax.random.PRNGKey(0)
        state = unsup.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])
        mesh = data_mesh()
        losses = []
        for i in range(n_steps):
            batch = shard_batch((jnp.asarray(acqs), jnp.asarray(te)), mesh)
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
            losses.append(float(metrics["G_loss"]))
        return losses, state, (cfg, g_fm, g_r2, tx, acqs, te)

    @pytest.mark.smoke
    def test_fm_mode_cycle_loss_decreases(self):
        losses, _, _ = self._run({"out_vars": "FM"}, n_steps=6)
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_pm_mode_with_r2_net(self):
        losses, state, ctx = self._run({"out_vars": "PM"}, n_steps=2)
        assert all(np.isfinite(l) for l in losses)
        cfg, g_fm, g_r2, tx, acqs, te = ctx
        # second phase: R2 net training
        r2_step = unsup.make_r2_train_step(cfg, g_fm, g_r2, tx)
        mesh = data_mesh()
        batch = shard_batch((jnp.asarray(acqs), jnp.asarray(te)), mesh)
        state, m = r2_step(state, batch, jax.random.PRNGKey(9))
        assert np.isfinite(float(m["R2_cycle_loss"]))

    def test_uq_heteroscedastic(self):
        losses, _, _ = self._run({"out_vars": "PM", "UQ": True,
                                  "UQ_R2s": True}, n_steps=2)
        assert all(np.isfinite(l) for l in losses)


class TestCalibConfigValidation:
    def test_uq_calib_without_uq_rejected(self, tmp_path):
        """UQ_calib with UQ=False would train against an identically-zero
        propagated variance (σ² floored, zero gradient) — the CLI must
        reject the config instead of burning epochs."""
        import pytest

        from ideal_gan_tpu.cli import train_unsup as cli
        with pytest.raises(SystemExit, match="UQ_calib requires"):
            cli.main(["--dataset", "t-badcalib", "--synthetic", "16",
                      "--data_size", "32", "--n_G_filters", "4",
                      "--batch_size", "4", "--epochs", "1",
                      "--UQ_calib", "True",
                      "--output_base", str(tmp_path)])


class TestCalibration:
    def test_calib_improves_heldout_nll(self):
        """σ-calibration stage (reference train-IDEAL-unsup.py:315-317):
        on data whose true noise exceeds the propagated σ, training the
        per-echo non-neg calibration scale must move it off 1.0 and
        improve the held-out heteroscedastic NLL vs the uncalibrated
        state."""
        cfg = dict(unsup.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=2, UQ=True,
                   UQ_calib=True, lr=0.05)
        g_fm, g_r2 = unsup.build_models(cfg)
        maps, te, acqs = synth_batch()
        rng = np.random.default_rng(3)
        noisy = acqs + rng.normal(scale=0.05, size=acqs.shape).astype(
            np.float32)
        key = jax.random.PRNGKey(0)
        step_fn, tx = unsup.make_train_step(cfg, g_fm, g_r2)
        state = unsup.init_state(cfg, g_fm, g_r2, tx, key, noisy[:1])

        calib_step = unsup.make_calib_train_step(cfg, g_fm, g_r2)
        nll_fn = unsup.eval_calibrated_nll(cfg, g_fm, g_r2)
        hold = (jnp.asarray(noisy[:4]), jnp.asarray(te[:4]))
        fit = (jnp.asarray(noisy[4:]), jnp.asarray(te[4:]))
        nll0 = float(nll_fn(state, *hold, key))
        for i in range(50):
            state, m = calib_step(state, fit, jax.random.fold_in(key, i))
            assert np.isfinite(float(m["calib_loss"]))
        nll1 = float(nll_fn(state, *hold, key))
        calib = np.asarray(state.calib)
        assert calib.shape == (cfg["n_echoes"],)
        assert np.all(calib >= 0.0)          # NonNeg projection holds
        assert np.any(np.abs(calib - 1.0) > 1e-3)  # actually trained
        assert nll1 < nll0                   # better-calibrated σ

    def test_calib_frozen_during_main_training(self):
        cfg = dict(unsup.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=2, UQ=True)
        g_fm, g_r2 = unsup.build_models(cfg)
        maps, te, acqs = synth_batch()
        key = jax.random.PRNGKey(0)
        step_fn, tx = unsup.make_train_step(cfg, g_fm, g_r2)
        state = unsup.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])
        state, _ = step_fn(state, (jnp.asarray(acqs), jnp.asarray(te)), key)
        np.testing.assert_array_equal(np.asarray(state.calib),
                                      np.ones(cfg["n_echoes"], np.float32))


class TestTEAug:
    @pytest.mark.smoke
    def test_vetnet_loss_decreases(self):
        cfg = dict(teaug.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=2)
        model = teaug.build_model(cfg)
        maps, _, _ = synth_batch()
        step_fn, tx = teaug.make_train_step(cfg, model)
        key = jax.random.PRNGKey(0)
        state = teaug.init_state(cfg, model, tx, key, h=32, w=32)
        rng = np.random.default_rng(0)
        mesh = data_mesh()
        losses = []
        for i in range(6):
            te = teaug.sample_te(rng, cfg, 8)
            batch = shard_batch((jnp.asarray(maps), jnp.asarray(te)), mesh)
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
            losses.append(float(metrics["G_loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_microbatched_step_matches_monolithic(self):
        """--microbatch grad accumulation matches the monolithic step
        (noise_std=0 so the per-chunk key split is inert; TV sums
        recovered via tv_scale). Exact in real arithmetic; f32 lowers
        batch-4 vs batch-8 convs to different reduction orders, so the
        tolerance covers reassociation noise, not a math difference."""
        base = dict(teaug.DEFAULTS)
        base.update(n_G_filters=4, batch_size=8, epochs=2, noise_std=0.0,
                    R2_TV_weight=1e-4, FM_TV_weight=1e-4)
        maps, _, _ = synth_batch()
        rng = np.random.default_rng(0)
        te = teaug.sample_te(rng, base, 8)
        batch = (jnp.asarray(maps), jnp.asarray(te))
        key = jax.random.PRNGKey(7)

        from ideal_gan_tpu.train.common import accumulate_microbatch_grads

        cfg = dict(base, microbatch=0)
        model = teaug.build_model(cfg)
        step_fn, tx = teaug.make_train_step(cfg, model)
        state = teaug.init_state(cfg, model, tx, jax.random.PRNGKey(0),
                                 h=32, w=32)

        # Grad-level comparison (pre-Adam: Adam divides by sqrt(v),
        # amplifying reassociation noise on near-ε grads to O(lr)).
        micro = 4
        n_chunks = batch[0].shape[0] // micro
        loss_full = teaug.make_loss_fn(cfg, model)
        loss_chunk = teaug.make_loss_fn(cfg, model,
                                        tv_scale=float(n_chunks))
        (l_full, m_full), g_full = jax.jit(jax.value_and_grad(
            loss_full, has_aux=True))(state.params, None, *batch, key)

        grad_fn = lambda p, chunk, k: jax.value_and_grad(
            loss_chunk, has_aux=True)(p, None, *chunk, k)
        (l_micro, m_micro), g_micro = jax.jit(
            lambda p, b, k: accumulate_microbatch_grads(
                grad_fn, p, b, k, micro))(state.params, batch, key)

        for k in m_full:
            np.testing.assert_allclose(
                np.asarray(m_micro[k]), np.asarray(m_full[k]),
                rtol=2e-3, atol=1e-6, err_msg=f"metric {k}")
        # Global-norm-relative grad agreement.
        d2 = sum(float(jnp.sum(jnp.square(a - b))) for a, b in zip(
            jax.tree.leaves(g_full), jax.tree.leaves(g_micro)))
        n2 = sum(float(jnp.sum(jnp.square(a)))
                 for a in jax.tree.leaves(g_full))
        assert d2 <= (2e-3) ** 2 * n2, (d2, n2)

        # The microbatched train step itself runs and matches the loss.
        cfg_m = dict(base, microbatch=micro)
        model_m = teaug.build_model(cfg_m)
        step_m, tx_m = teaug.make_train_step(cfg_m, model_m)
        state_m = teaug.init_state(cfg_m, model_m, tx_m,
                                   jax.random.PRNGKey(0), h=32, w=32)
        state_m, metrics_m = step_m(state_m, batch, key)
        np.testing.assert_allclose(float(metrics_m["G_loss"]),
                                   float(l_full), rtol=2e-3)

    def _run_model(self, cfg_over, n_steps=6, with_r2=False):
        cfg = dict(teaug.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=2, **cfg_over)
        model = teaug.build_model(cfg)
        r2_model = teaug.build_r2_model(cfg) if with_r2 else None
        maps, _, _ = synth_batch()
        step_fn, tx = teaug.make_train_step(cfg, model, r2_model)
        key = jax.random.PRNGKey(0)
        state = teaug.init_state(cfg, model, tx, key, h=32, w=32,
                                 r2_model=r2_model)
        r2_step = (teaug.make_r2_train_step(cfg, model, r2_model, tx)
                   if with_r2 else None)
        rng = np.random.default_rng(0)
        mesh = data_mesh()
        losses, r2_losses = [], []
        for i in range(n_steps):
            te = teaug.sample_te(rng, cfg, 8)
            batch = shard_batch((jnp.asarray(maps), jnp.asarray(te)), mesh)
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
            losses.append(float(metrics["G_loss"]))
            if with_r2:
                state, r2m = r2_step(state, batch,
                                     jax.random.fold_in(key, 100 + i))
                r2_losses.append(float(r2m["R2_loss"]))
        return losses, r2_losses

    def test_unet_pm_loss_decreases(self):
        losses, _ = self._run_model({"G_model": "U-Net"})
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_unet_wf_magnitude_mode(self):
        losses, _ = self._run_model({"G_model": "U-Net", "out_vars": "WF"})
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_mdwf_wfpm_loss_decreases(self):
        losses, _ = self._run_model({"G_model": "MDWF-Net"})
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_2unet_trains_both_generators(self):
        losses, r2_losses = self._run_model({"G_model": "2U-Net"},
                                            with_r2=True)
        assert all(np.isfinite(l) for l in losses + r2_losses)
        assert losses[-1] < losses[0]
        assert r2_losses[-1] < r2_losses[0]

    def test_sel_weight_phase_coherence(self):
        losses, _ = self._run_model({"sel_weight": True,
                                     "sel_weight_pwr": 2.0}, n_steps=4)
        assert all(np.isfinite(l) for l in losses)

    def test_te_sampling_presets(self):
        rng = np.random.default_rng(0)
        cfg = dict(teaug.DEFAULTS)
        te = teaug.sample_te(rng, cfg, 4)
        assert te.shape == (4, 6, 1)
        cfg3 = dict(teaug.DEFAULTS, field=3.0)
        te3 = teaug.sample_te(rng, cfg3, 2)
        assert te3[0, 0, 0] < te[0, 0, 0] + 2e-3


class TestFMOffset:
    def test_learned_offset_recovers_global_shift(self):
        """A constant field-map shift in the data must flow into the
        learnable offset (the DC channel instance-norm CNNs can't carry)."""
        cfg = dict(unsup.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=2,
                   learn_fm_offset=True, fm_offset_lr=5e-2)
        g_fm, g_r2 = unsup.build_models(cfg)
        maps, te, _ = synth_batch()
        maps = maps.copy()
        maps[:, 2, ..., 0] += 0.15  # global FM shift
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps),
                                        jnp.asarray(te)))
        step_fn, tx = unsup.make_train_step(cfg, g_fm, g_r2)
        key = jax.random.PRNGKey(0)
        state = unsup.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])
        offsets = [float(state.fm_offset)]
        for i in range(10):
            state, m = step_fn(state, (jnp.asarray(acqs), jnp.asarray(te)),
                               jax.random.fold_in(key, i))
            offsets.append(float(state.fm_offset))
        assert np.isfinite(offsets[-1])
        assert abs(offsets[-1]) > abs(offsets[0])  # offset is learning

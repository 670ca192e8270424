"""Magnitude (Rician) and single-subject trainer smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import physics as ph
from ideal_gan_tpu.parallel import data_mesh, shard_batch
from ideal_gan_tpu.train import mag, single

from test_physics import make_maps


def maps_batch(nb=8, h=32, w=32):
    return np.concatenate([make_maps(nb=nb // 2, h=h, w=w, seed=s)
                           for s in (1, 2)])


class TestMagTrainer:
    def _run(self, cfg_over, n_steps=4):
        cfg = dict(mag.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=4, **cfg_over)
        model = mag.build_model(cfg)
        B = maps_batch()
        te = np.asarray(ph.te_train(cfg["n_echoes"], bs=8))
        step_fn, tx = mag.make_train_step(cfg, model)
        key = jax.random.PRNGKey(0)
        state = mag.init_state(cfg, model, tx, key)
        mesh = data_mesh()
        losses = []
        for i in range(n_steps):
            batch = shard_batch((jnp.asarray(B), jnp.asarray(te)), mesh)
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
            losses.append(float(metrics["G_loss"]))
        return losses

    @pytest.mark.smoke
    def test_supervised_mse(self):
        losses = self._run({"training_mode": "supervised",
                            "main_loss": "MSE"}, n_steps=6)
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_unsupervised_cycle(self):
        losses = self._run({"training_mode": "unsupervised",
                            "main_loss": "MAE"}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

    def test_rician_likelihood(self):
        losses = self._run({"training_mode": "supervised",
                            "main_loss": "Rice"}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

    def test_bf16_compute(self):
        # bf16 CNN + f32 Rician head/physics (params stay f32)
        losses = self._run({"training_mode": "supervised",
                            "main_loss": "Rice", "bf16": True}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

    def test_physics_regularizers(self):
        losses = self._run({"training_mode": "unsupervised",
                            "LS_NZ_weight": 1e-4, "LS_cond_weight": 1e-6,
                            "A_demod_TV_weight": 1e-7}, n_steps=2)
        assert all(np.isfinite(l) for l in losses)


class TestSingleTrainer:
    def _run(self, cfg_over, n_steps=5):
        cfg = dict(single.DEFAULTS)
        cfg.update(n_G_filters=4, epochs=10, **cfg_over)
        g_mag, g_pha = single.build_models(cfg)
        # single-subject "dataset" = 4 slices with common phase
        rng = np.random.default_rng(0)
        h = w = 32
        nb = 4
        mags = rng.uniform(0.1, 0.8, (nb, h, w, 2)).astype(np.float32)
        phas = rng.uniform(-0.1, 0.1, (nb, h, w, 2)).astype(np.float32)
        r2s = rng.uniform(0.0, 0.3, (nb, h, w)).astype(np.float32)
        phi = rng.uniform(-0.2, 0.2, (nb, h, w)).astype(np.float32)
        zeros = np.zeros_like(r2s)
        row0 = np.concatenate([mags, r2s[..., None], zeros[..., None]], -1)
        row1 = np.concatenate([phas, phi[..., None], zeros[..., None]], -1)
        mp_maps = np.stack([row0, row1], 1).astype(np.float32)
        te = ph.te_train(cfg["n_echoes"], bs=nb)
        A = np.asarray(ph.synthesize_mag_phase(jnp.asarray(mp_maps), te))
        # GT complex maps for the masks / split losses
        water = mags[..., 0] * np.exp(1j * phas[..., 0] * 4 * np.pi)
        fat = mags[..., 1] * np.exp(1j * phas[..., 1] * 4 * np.pi)
        B = np.stack([
            np.stack([water.real, water.imag], -1),
            np.stack([fat.real, fat.imag], -1),
            np.stack([phi, r2s], -1)], 1).astype(np.float32)

        step_fn, tx = single.make_train_step(cfg, g_mag, g_pha)
        key = jax.random.PRNGKey(0)
        state = single.init_state(cfg, g_mag, g_pha, tx, key, h=h, w=w)
        mesh = data_mesh(4)  # full-batch of 4 slices -> 4-device mesh
        losses = []
        for i in range(n_steps):
            batch = shard_batch((jnp.asarray(A), jnp.asarray(B),
                                 jnp.asarray(np.asarray(te))), mesh)
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
            losses.append(float(metrics["G_loss"]))
        return losses

    def test_bipolar_mode(self):
        losses = self._run({"grad_mode": "bipolar", "BP_GR_weight": 1e-6},
                           n_steps=5)
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    @pytest.mark.smoke
    def test_unipolar_mode(self):
        losses = self._run({"grad_mode": "unipolar"}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

    def test_bf16_compute(self):
        losses = self._run({"grad_mode": "bipolar", "bf16": True}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

"""AI-DEAL unsupervised and TE-augmentation trainer smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

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


class TestTEAug:
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

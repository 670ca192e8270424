"""End-to-end supervised training smoke tests on synthetic physics data,
running data-parallel over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import physics as ph
from ideal_gan_tpu.parallel import data_mesh, shard_batch
from ideal_gan_tpu.train import sup

from test_physics import make_maps


def make_dataset(n=16, h=32, w=32, ne=6):
    maps = np.concatenate([make_maps(nb=n // 2, h=h, w=w, seed=s)
                           for s in (1, 2)])
    te = ph.te_train(ne, bs=n)
    acqs = np.asarray(ph.synthesize(jnp.asarray(maps), te))
    return acqs, maps, np.asarray(te)


def run_steps(cfg_overrides, n_steps=3):
    cfg = dict(sup.DEFAULTS)
    cfg.update(n_G_filters=8, batch_size=8, epochs=2, **cfg_overrides)
    model = sup.build_model(cfg)
    acqs, maps, te = make_dataset()
    step_fn, tx = sup.make_train_step(cfg, model)
    key = jax.random.PRNGKey(0)
    state = sup.init_state(cfg, model, tx, key, acqs[:1])
    mesh = data_mesh()
    losses = []
    for i in range(n_steps):
        batch = (acqs[:8], maps[:8], te[:8])
        batch = shard_batch(tuple(jnp.asarray(b) for b in batch), mesh)
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["G_loss"]))
    return losses, state


class TestMicrobatch:
    def test_microbatched_step_matches_monolithic(self):
        """--microbatch gradient accumulation matches the monolithic
        step: with noise off, the chunk-scanned step reproduces the
        loss/metrics/params (TV sums recovered via tv_scale; mean terms
        average over equal chunks). Exact in real arithmetic; in f32 XLA
        lowers batch-2 and batch-8 convs to different reduction orders
        and the norm chain amplifies the reassociation, so the observed
        agreement is ~1e-4 rel — the tolerance reflects that, not a math
        difference. This is the f32-compiler-crash workaround path
        (docs/DESIGN.md), so agreement is load-bearing."""
        base = dict(sup.DEFAULTS)
        base.update(n_G_filters=8, batch_size=8, epochs=2,
                    out_vars="WF-PM", G_model="U-Net",
                    R2_TV_weight=1e-4, FM_TV_weight=1e-4,
                    R2_L1_weight=1e-4, FM_L1_weight=1e-4)
        acqs, maps, te = make_dataset()
        batch = tuple(jnp.asarray(b[:8]) for b in (acqs, maps, te))
        key = jax.random.PRNGKey(3)

        from ideal_gan_tpu.train.common import accumulate_microbatch_grads

        cfg = dict(base, microbatch=0)
        model = sup.build_model(cfg)
        step_fn, tx = sup.make_train_step(cfg, model)
        state = sup.init_state(cfg, model, tx, jax.random.PRNGKey(0),
                               acqs[:1])

        # Grad-level comparison (pre-Adam: Adam divides by sqrt(v), which
        # amplifies reassociation noise on near-zero grads to O(lr)).
        micro = 2
        n_chunks = batch[0].shape[0] // micro
        loss_full = sup.make_loss_fn(cfg, model)
        loss_chunk = sup.make_loss_fn(cfg, model, tv_scale=float(n_chunks))
        (l_full, m_full), g_full = jax.jit(jax.value_and_grad(
            loss_full, has_aux=True))(state.params, *batch, key)

        grad_fn = lambda p, chunk, k: jax.value_and_grad(
            loss_chunk, has_aux=True)(p, *chunk, k)
        (l_micro, m_micro), g_micro = jax.jit(
            lambda p, b, k: accumulate_microbatch_grads(
                grad_fn, p, b, k, micro))(state.params, batch, key)

        for k in m_full:
            np.testing.assert_allclose(
                np.asarray(m_micro[k]), np.asarray(m_full[k]),
                rtol=2e-3, atol=1e-6, err_msg=f"metric {k}")
        np.testing.assert_allclose(float(l_micro), float(l_full), rtol=2e-3)
        # Global-norm-relative grad agreement: ‖g_micro − g_full‖ ≤
        # 2e-3 ‖g_full‖ over the whole tree.
        d2 = sum(float(jnp.sum(jnp.square(a - b))) for a, b in zip(
            jax.tree.leaves(g_full), jax.tree.leaves(g_micro)))
        n2 = sum(float(jnp.sum(jnp.square(a)))
                 for a in jax.tree.leaves(g_full))
        assert d2 <= (2e-3) ** 2 * n2, (d2, n2)

        # And the microbatched train step itself runs and stays finite.
        cfg_m = dict(base, microbatch=micro)
        model_m = sup.build_model(cfg_m)
        step_m, tx_m = sup.make_train_step(cfg_m, model_m)
        state_m = sup.init_state(cfg_m, model_m, tx_m, jax.random.PRNGKey(0),
                                 acqs[:1])
        state_m, metrics_m = step_m(state_m, batch, key)
        assert np.isfinite(float(metrics_m["G_loss"]))
        np.testing.assert_allclose(float(metrics_m["G_loss"]),
                                   float(l_full), rtol=2e-3)

    def test_microbatch_requires_divisible_batch(self):
        cfg = dict(sup.DEFAULTS)
        cfg.update(n_G_filters=8, batch_size=8, microbatch=3, epochs=2)
        model = sup.build_model(cfg)
        acqs, maps, te = make_dataset()
        step_fn, tx = sup.make_train_step(cfg, model)
        state = sup.init_state(cfg, model, tx, jax.random.PRNGKey(0),
                               acqs[:1])
        batch = tuple(jnp.asarray(b[:8]) for b in (acqs, maps, te))
        with pytest.raises(ValueError, match="divisible"):
            step_fn(state, batch, jax.random.PRNGKey(0))


class TestSupTrainer:
    @pytest.mark.smoke
    def test_wf_mode_loss_decreases(self):
        losses, state = run_steps({"out_vars": "WF"}, n_steps=6)
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_pm_mode_with_physics_fit(self):
        losses, _ = run_steps({"out_vars": "PM"}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

    def test_wfpm_unet(self):
        losses, _ = run_steps(
            {"out_vars": "WF-PM", "G_model": "U-Net"}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

    def test_te_resynthesis_mode(self):
        """TE≠default → A regenerated on-device from B through the forward
        op (train-sup.py:241-242)."""
        losses, _ = run_steps(
            {"out_vars": "WF", "TE1": 0.0011, "dTE": 0.0019}, n_steps=3)
        assert all(np.isfinite(l) for l in losses)

    def test_data_parallel_sharding(self):
        """The batch is actually sharded over 8 CPU devices."""
        mesh = data_mesh()
        assert mesh.devices.size == 8
        x = jnp.zeros((8, 4, 4))
        xs = shard_batch(x, mesh)
        assert len(xs.sharding.device_set) == 8

    def test_dead_mebcrn_config_rejected(self):
        cfg = dict(sup.DEFAULTS)
        cfg["G_model"] = "MEBCRN"
        try:
            sup.build_model(cfg)
            assert False, "should have raised"
        except NameError as e:
            assert "MEBCRN" in str(e)


class TestBF16:
    def test_bf16_training_finite_and_decreasing(self):
        losses, _ = run_steps({"out_vars": "WF", "bf16": True}, n_steps=6)
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestDonation:
    """The production train steps donate their input state
    (train/*.py donate_argnums=0) so the old and new params+optimizer
    trees never coexist in HBM; the eval step must NOT donate, because
    the CLI routes the live state through it between train steps."""

    def _setup(self):
        cfg = dict(sup.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=2, epochs=1, out_vars="WF")
        model = sup.build_model(cfg)
        acqs, maps, te = make_dataset(n=2)
        step_fn, tx = sup.make_train_step(cfg, model)
        eval_fn = sup.make_eval_step(cfg, model)
        key = jax.random.PRNGKey(0)
        state = sup.init_state(cfg, model, tx, key, acqs[:1])
        batch = tuple(jnp.asarray(b) for b in (acqs, maps, te))
        return step_fn, eval_fn, state, batch, key

    def test_train_step_consumes_state(self):
        step_fn, _, state, batch, key = self._setup()
        new_state, _ = step_fn(state, batch, key)
        with pytest.raises(Exception, match="[Dd]elet|donat"):
            step_fn(state, batch, key)  # donated buffers are gone
        # the returned state is live
        step_fn(new_state, batch, key)

    def test_eval_step_preserves_state(self):
        step_fn, eval_fn, state, batch, key = self._setup()
        m1 = eval_fn(state, batch, key)
        m2 = eval_fn(state, batch, key)          # state reusable
        assert float(m1["G_loss"]) == float(m2["G_loss"])
        step_fn(state, batch, key)               # still consumable

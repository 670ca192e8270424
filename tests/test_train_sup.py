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

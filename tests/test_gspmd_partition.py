"""GSPMD partitionability of the fused Pallas kernels (round-4 VERDICT
weak #1 / next-round #1).

A bare `pallas_call` inside a pjit'ed step is opaque to the SPMD
partitioner: batch-sharded inputs compile to a full-batch all-gather
plus replicated kernel compute on every device (measured: 37-46
all-gather ops in the fused unsup step's HLO on this 8-device mesh).
`ops.partition.dp_partitioned` registers the batch-elementwise
partitioning rule, after which the same steps must compile with ZERO
all-gathers — these tests pin that property by counting collectives in
the compiled HLO text (repro recipe per ADVICE r4: count substring
occurrences of the op name in `compiled.as_text()`; the exact pre-fix
number is shape-dependent, the post-fix invariant is exactly 0).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu import physics as ph
from ideal_gan_tpu.ops import cycle_full_fused
from ideal_gan_tpu.parallel import batch_sharding, data_mesh, shard_batch
from ideal_gan_tpu.train import unsup

from test_physics import make_maps


def _allgathers(txt: str) -> int:
    return txt.count("all-gather")


class TestFusedCyclePartition:
    @pytest.mark.smoke
    def test_cycle_grad_zero_allgather_and_value(self):
        """Fused cycle fwd+bwd with batch-sharded inputs: no gathers, and
        the sharded value matches the unsharded one."""
        maps = make_maps(nb=8, h=32, w=32, seed=7)
        te = ph.te_train(6, bs=8)
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps), te))
        pm = np.asarray(maps[:, 2:3])
        te = np.asarray(te)

        def loss(A, p, t):
            wf, ah = cycle_full_fused(A, p, t, 1.5, uniform_te=True)
            return jnp.mean(jnp.square(A - ah)) + jnp.mean(jnp.abs(wf))

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        mesh = data_mesh()
        sh = batch_sharding(mesh)
        args = tuple(jax.device_put(jnp.asarray(x), sh)
                     for x in (acqs, pm, te))
        txt = g.lower(*args).compile().as_text()
        assert _allgathers(txt) == 0, (
            f"fused cycle re-gathers under DP: {_allgathers(txt)} "
            "all-gather ops in compiled HLO")
        v_sh, grads_sh = g(*args)
        v1, grads1 = g(jnp.asarray(acqs), jnp.asarray(pm), jnp.asarray(te))
        np.testing.assert_allclose(float(v_sh), float(v1), rtol=1e-5)
        for a, b in zip(grads_sh, grads1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    @pytest.mark.smoke
    def test_unsup_fused_step_hlo_zero_allgather(self):
        """The flagship unsup train step (fused physics cycle inside the
        jitted step, train/unsup.py) compiled over the 8-device mesh:
        zero all-gathers; the gradient DP sync (all-reduce) present."""
        cfg = dict(unsup.DEFAULTS)
        cfg.update(n_G_filters=4, batch_size=8, epochs=1, out_vars="FM",
                   fused_physics=True, uniform_te=True)
        g_fm, g_r2 = unsup.build_models(cfg)
        maps = make_maps(nb=8, h=32, w=32, seed=9)
        te = ph.te_train(6, bs=8)
        acqs = np.asarray(ph.synthesize(jnp.asarray(maps), te))
        step_fn, tx = unsup.make_train_step(cfg, g_fm, g_r2)
        key = jax.random.PRNGKey(0)
        state = unsup.init_state(cfg, g_fm, g_r2, tx, key, acqs[:1])
        mesh = data_mesh()
        batch = shard_batch((jnp.asarray(acqs),
                             jnp.asarray(np.asarray(te))), mesh)
        txt = step_fn.lower(state, batch, key).compile().as_text()
        n_ag = _allgathers(txt)
        assert n_ag == 0, (
            f"unsup fused step re-gathers under DP: {n_ag} all-gathers")
        assert "all-reduce" in txt  # the DP gradient sync


class TestConvLSTMPartition:
    """The fused ConvLSTM kernels engage only on TPU by default; the
    IDEAL_GAN_CONVLSTM_FUSED=force escape hatch runs them in interpret
    mode on the CPU mesh so the partitioning rule is testable here."""

    def _data(self, nb=8, ne=3, h=16, w=16, cin=2, f=8):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(5), 4)
        x = jax.random.normal(k1, (nb, ne, h, w, cin), jnp.float32)
        k = jax.random.normal(k2, (3, 3, cin + f, 4 * f), jnp.float32) * 0.2
        b = jax.random.normal(k3, (4 * f,), jnp.float32) * 0.1
        g = jax.random.normal(k4, (nb, h, w, f), jnp.float32)
        return x, k, b, g

    def test_fused_convlstm_zero_allgather_and_grad_parity(self, monkeypatch):
        from ideal_gan_tpu.ops import pallas_convlstm as pc
        x, k, b, g = self._data()

        def loss(x_, k_, b_):
            return jnp.sum(pc.convlstm_fused(x_, k_, b_) * g)

        mesh = data_mesh()
        sh = batch_sharding(mesh)
        # XLA recurrence path (reference): fused gate off
        monkeypatch.setenv("IDEAL_GAN_CONVLSTM_FUSED", "0")
        v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, k, b)
        # fused Pallas path (interpret), batch-sharded over the mesh
        monkeypatch.setenv("IDEAL_GAN_CONVLSTM_FUSED", "force")
        fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        xs = jax.device_put(x, sh)
        txt = fn.lower(xs, k, b).compile().as_text()
        n_ag = _allgathers(txt)
        assert n_ag == 0, (
            f"fused ConvLSTM re-gathers under DP: {n_ag} all-gathers")
        v, (dx, dk, db) = fn(xs, k, b)
        np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(g_ref[0]),
                                   atol=2e-4, rtol=1e-3)
        # dk/db reduce over batch: per-batch kernel slots + XLA nb-sum
        # (the DP all-reduce) must equal the single-device reduction
        np.testing.assert_allclose(np.asarray(dk), np.asarray(g_ref[1]),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(db), np.asarray(g_ref[2]),
                                   atol=2e-3, rtol=1e-3)

    def test_convlstm_module_force_gate(self, monkeypatch):
        """The ConvLSTM module engages the fused kernel under force mode
        off-TPU (so the partitioning tests exercise the real call path
        the TPU trainers take)."""
        from ideal_gan_tpu.models.convlstm import ConvLSTM
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16, 2))
        mod = ConvLSTM(filters=8)
        params = mod.init(jax.random.PRNGKey(1), x)
        monkeypatch.setenv("IDEAL_GAN_CONVLSTM_FUSED", "0")
        ref = mod.apply(params, x)
        monkeypatch.setenv("IDEAL_GAN_CONVLSTM_FUSED", "force")
        out = mod.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

"""Model zoo shape/behavior tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ideal_gan_tpu.models.unet import UNet, MDWFNet, VETNet
from ideal_gan_tpu.models.convlstm import ConvLSTM
from ideal_gan_tpu.models.attention import SelfAttention, adain
from ideal_gan_tpu.models.bayes import FlipoutConv
from ideal_gan_tpu.prob import Normal, Rician

KEY = jax.random.PRNGKey(0)


def init_and_apply(model, *args, rngs=None, **kwargs):
    variables = model.init({"params": KEY, **(rngs or {})}, *args, **kwargs)
    out = model.apply(variables, *args, rngs=rngs or None, **kwargs)
    return variables, out


class TestBlocks:
    def test_convlstm(self):
        x = jnp.zeros((2, 6, 16, 16, 2))
        _, out = init_and_apply(ConvLSTM(8), x)
        assert out.shape == (2, 16, 16, 8)

    def test_self_attention_identity_at_init(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 8, 8, 16)).astype(np.float32))
        _, out = init_and_apply(SelfAttention(), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))  # gamma=0

    def test_adain_moments(self):
        rng = np.random.default_rng(1)
        content = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        style = jnp.asarray(rng.normal(2.0, 0.5, size=(2, 16)).astype(np.float32))
        out = adain(content, style)
        got_mean = np.mean(np.asarray(out), axis=(1, 2))
        want_mean = np.mean(np.asarray(style), axis=1, keepdims=True)
        np.testing.assert_allclose(got_mean, np.broadcast_to(want_mean, got_mean.shape),
                                   rtol=1e-2, atol=1e-2)

    def test_flipout_conv_deterministic_and_stochastic(self):
        x = jnp.ones((2, 8, 8, 3))
        model = FlipoutConv(4)
        variables = model.init({"params": KEY, "bayes": KEY}, x)
        out_det = model.apply(variables, x, deterministic=True)
        assert out_det.shape == (2, 8, 8, 4)
        o1 = model.apply(variables, x, rngs={"bayes": jax.random.PRNGKey(1)})
        o2 = model.apply(variables, x, rngs={"bayes": jax.random.PRNGKey(2)})
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 0
        # KL is sown into the 'losses' collection.
        _, aux = model.apply(variables, x, deterministic=True,
                             mutable=["losses"])
        kl = jax.tree_util.tree_leaves(aux["losses"])
        assert len(kl) >= 1 and all(float(k) > 0 for k in kl)


class TestUNet:
    @pytest.mark.smoke
    def test_me_unet_fm_head(self):
        x = jnp.zeros((2, 6, 32, 32, 2))
        model = UNet(n_out=1, me_layer=True, filters=8, num_layers=2)
        _, out = init_and_apply(model, x)
        assert out.shape == (2, 1, 32, 32, 1)

    def test_bayesian_normal_head(self):
        x = jnp.zeros((1, 6, 32, 32, 2))
        model = UNet(n_out=1, me_layer=True, bayesian=True, filters=8,
                     num_layers=2, output_activation="tanh")
        _, out = init_and_apply(model, x)
        assert isinstance(out, Normal)
        assert out.loc.shape == (1, 1, 32, 32, 1)
        assert np.all(np.asarray(out.scale) >= 0)

    def test_bayesian_rician_head(self):
        x = jnp.zeros((1, 6, 32, 32, 1))
        model = UNet(n_out=1, me_layer=True, bayesian=True, filters=8,
                     num_layers=2, output_activation="sigmoid")
        _, out = init_and_apply(model, x)
        assert isinstance(out, Rician)

    def test_std_out(self):
        x = jnp.zeros((1, 32, 32, 2))
        model = UNet(n_out=2, std_out=True, filters=8, num_layers=2)
        _, (out, sigma) = init_and_apply(model, x)
        assert out.shape == (1, 32, 32, 2)
        assert sigma.shape == (1, 32, 32, 2)

    def test_te_conditioning(self):
        x = jnp.zeros((2, 32, 32, 12))
        te = jnp.linspace(1e-3, 1e-2, 6)[None].repeat(2, 0)
        model = UNet(n_out=2, te_input=True, filters=8, num_layers=2)
        variables = model.init(KEY, x, te)
        o1 = model.apply(variables, x, te)
        o2 = model.apply(variables, x, te * 2.0)
        assert o1.shape == (2, 32, 32, 2)
        # TE must influence the output.
        x2 = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 32, 32, 12)).astype(np.float32))
        d = np.abs(np.asarray(model.apply(variables, x2, te))
                   - np.asarray(model.apply(variables, x2, te * 2.0))).max()
        assert d > 0

    def test_echo_folding_5d_no_me(self):
        x = jnp.zeros((2, 6, 32, 32, 2))
        model = UNet(n_out=1, me_layer=False, filters=8, num_layers=2)
        _, out = init_and_apply(model, x)
        assert out.shape == (2, 6, 32, 32, 1)

    def test_self_attention_option(self):
        x = jnp.zeros((1, 6, 32, 32, 2))
        model = UNet(n_out=1, me_layer=True, self_attention=True, filters=8,
                     num_layers=2)
        _, out = init_and_apply(model, x)
        assert out.shape == (1, 1, 32, 32, 1)


class TestMultiDecoder:
    def test_mdwf(self):
        x = jnp.zeros((2, 32, 32, 12))
        model = MDWFNet(filters=8, num_layers=2)
        _, out = init_and_apply(model, x)
        assert out.shape == (2, 32, 32, 4)
        o = np.asarray(out)
        assert o[..., :2].min() >= 0 and o[..., :2].max() <= 1  # sigmoid WF
        assert o[..., 2].min() >= 0  # relu R2*
        assert o[..., 3].min() >= -1 and o[..., 3].max() <= 1  # tanh FM

    def test_mdwf_te_input(self):
        x = jnp.zeros((2, 32, 32, 12))
        te = jnp.linspace(1e-3, 1e-2, 6)[None].repeat(2, 0)
        model = MDWFNet(filters=8, num_layers=2, te_input=True)
        _, out = init_and_apply(model, x, te)
        assert out.shape == (2, 32, 32, 4)

    def test_vetnet_me(self):
        x = jnp.zeros((2, 6, 32, 32, 2))
        te = jnp.linspace(1e-3, 1e-2, 6)[None].repeat(2, 0)
        model = VETNet(me_layer=True, te_input=True, filters=8, num_layers=2)
        _, out = init_and_apply(model, x, te)
        assert out.shape == (2, 1, 32, 32, 2)  # (FM, R2*)
        o = np.asarray(out)
        assert o[..., 1].min() >= 0 and o[..., 1].max() <= 1  # sigmoid R2*

    def test_vetnet_gradients(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 6, 32, 32, 2)).astype(np.float32))
        te = jnp.linspace(1e-3, 1e-2, 6)[None]
        model = VETNet(me_layer=True, te_input=True, filters=8, num_layers=2)
        variables = model.init(KEY, x, te)

        def loss(params):
            out = model.apply({"params": params}, x, te)
            return jnp.mean(jnp.square(out))

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


class TestDistributions:
    def test_normal_log_prob(self):
        d = Normal(jnp.zeros(4), jnp.ones(4))
        lp = np.asarray(d.log_prob(jnp.zeros(4)))
        np.testing.assert_allclose(lp, -0.5 * np.log(2 * np.pi), rtol=1e-6)

    def test_rician_against_scipy(self):
        scipy_stats = pytest.importorskip("scipy.stats")
        nu, sigma = 2.0, 0.7
        d = Rician(jnp.asarray(nu), jnp.asarray(sigma))
        xs = np.linspace(0.1, 5.0, 9)
        ref = scipy_stats.rice.logpdf(xs, b=nu / sigma, scale=sigma)
        got = np.asarray(d.log_prob(jnp.asarray(xs)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(d.mean()),
                                   scipy_stats.rice.mean(b=nu / sigma, scale=sigma),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(d.variance()),
                                   scipy_stats.rice.var(b=nu / sigma, scale=sigma),
                                   rtol=1e-3)

    def test_rician_sampling_moments(self):
        d = Rician(jnp.asarray(1.5), jnp.asarray(0.5))
        s = d.sample(jax.random.PRNGKey(0), (20000,))
        np.testing.assert_allclose(float(jnp.mean(s)), float(d.mean()), rtol=2e-2)
        np.testing.assert_allclose(float(jnp.var(s)), float(d.variance()), rtol=5e-2)

    def test_rician_log_prob_zeroed_nonpositive(self):
        d = Rician(jnp.asarray(1.0), jnp.asarray(0.5))
        assert float(d.log_prob(jnp.asarray(-1.0))) == 0.0


class TestCSELayer:
    def test_unet_cse_layer_returns_cycle(self):
        """CSE_layer option: the model output is the physics reprojection
        of its input acquisitions (DLlib/module.py:431-433)."""
        from ideal_gan_tpu import physics as ph
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 6, 32, 32, 2)).astype(np.float32) * 0.3)
        te = ph.te_train(6, bs=1)
        model = UNet(n_out=2, me_layer=True, cse_layer=True, filters=8,
                     num_layers=2)
        variables = model.init(KEY, x, te[..., 0])
        out = model.apply(variables, x, te[..., 0])
        assert out.shape == x.shape  # reprojected acquisitions
        assert np.all(np.isfinite(np.asarray(out)))


class TestRemat:
    def test_remat_is_bit_exact_and_checkpoint_compatible(self):
        """remat=True must produce the IDENTICAL param tree (module names
        preserved — checkpoints interchange) and bit-identical outputs
        and gradients; only peak activation memory differs."""
        import flax
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 6, 16, 16, 2)).astype(
            np.float32))
        te = jnp.asarray((rng.random((2, 6)) * 0.01).astype(np.float32))
        for kw, cls, args in (
                (dict(n_out=1, me_layer=True, filters=4, num_layers=2),
                 UNet, (x,)),
                (dict(me_layer=True, te_input=True, filters=4,
                      num_layers=2), VETNet, (x, te))):
            a, b = cls(**kw), cls(remat=True, **kw)
            va = a.init(jax.random.PRNGKey(0), *args)
            assert (set(flax.traverse_util.flatten_dict(va["params"])) ==
                    set(flax.traverse_util.flatten_dict(
                        b.init(jax.random.PRNGKey(0), *args)["params"])))
            np.testing.assert_array_equal(np.asarray(a.apply(va, *args)),
                                          np.asarray(b.apply(va, *args)))

            def loss(p, m):
                return jnp.sum(jnp.square(m.apply({"params": p}, *args)))

            ga = jax.grad(loss)(va["params"], a)
            gb = jax.grad(loss)(va["params"], b)
            for x1, x2 in zip(jax.tree_util.tree_leaves(ga),
                              jax.tree_util.tree_leaves(gb)):
                np.testing.assert_array_equal(np.asarray(x1),
                                              np.asarray(x2))

    def test_remat_train_flag_stays_static(self):
        """`train` must be a STATIC arg of the remat'ed blocks: configs
        that branch on it (dropout > 0, batch_norm) crashed with
        TracerBoolConversionError when static_argnums pointed at x
        (round-3 review finding)."""
        from ideal_gan_tpu.models.unet import _maybe_remat
        x = jnp.ones((1, 8, 8, 2))
        Block, _, _ = _maybe_remat(True)
        for kw, rngs in ((dict(dropout=0.5),
                          {"dropout": jax.random.PRNGKey(2)}),
                         (dict(norm="batch_norm"), {})):
            m = Block(4, **kw)
            v = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, True)
            out, _ = m.apply(v, x, True, rngs=rngs,
                             mutable=["batch_stats"])
            assert np.isfinite(np.asarray(out)).all()

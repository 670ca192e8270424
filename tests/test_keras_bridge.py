"""Keras→Flax weight-bridge parity: build each reference architecture
(DLlib/module.py) with random weights, convert, and require identical
forward outputs.

This is the trained-model portability axis: a reference user's Keras
checkpoint, pushed through `ideal_gan_tpu.bridge`, must behave
identically in the Flax modules. Random weights prove the layer mapping
(identical weights ⇒ identical features), so real trained weights
convert correctly whenever supplied.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from ideal_gan_tpu.bridge import (convert_decoder,  # noqa: E402
                                  convert_encoder, convert_mdwf_generator,
                                  convert_patchgan, convert_pm_generator,
                                  convert_unet, load_reference_dlmodule)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_reference_dlmodule()


def _cmp(keras_out, flax_out, atol=2e-4):
    a = np.asarray(keras_out)
    b = np.asarray(flax_out)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3)


class TestUNetBridge:
    @pytest.mark.smoke
    def test_plain_2d(self, ref):
        from ideal_gan_tpu.models import UNet
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        km = ref.UNet((32, 32, 2), n_out=2, ME_layer=False, te_input=False,
                      filters=8, num_layers=2, self_attention=True)
        fm = UNet(n_out=2, me_layer=False, te_input=False, filters=8,
                  num_layers=2, self_attention=True)
        params = convert_unet(km, fm, jnp.asarray(x))
        _cmp(km(x, training=False), fm.apply(params, jnp.asarray(x),
                                             train=False))

    def test_me_te(self, ref):
        from ideal_gan_tpu.models import UNet
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 6, 32, 32, 2)).astype(np.float32)
        te = (rng.random(size=(2, 6)).astype(np.float32) * 8 + 1) * 1e-3
        km = ref.UNet((6, 32, 32, 2), n_out=2, ME_layer=True, te_input=True,
                      filters=8, num_layers=2, self_attention=True)
        fm = UNet(n_out=2, me_layer=True, te_input=True, filters=8,
                  num_layers=2, self_attention=True)
        params = convert_unet(km, fm, jnp.asarray(x), jnp.asarray(te))
        _cmp(km([x, te], training=False),
             fm.apply(params, jnp.asarray(x), jnp.asarray(te), train=False))

    def test_std_out_head(self, ref):
        from ideal_gan_tpu.models import UNet
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        km = ref.UNet((32, 32, 2), n_out=1, std_out=True, filters=8,
                      num_layers=2)
        fm = UNet(n_out=1, std_out=True, filters=8, num_layers=2)
        params = convert_unet(km, fm, jnp.asarray(x))
        k_out, k_std = km(x, training=False)
        f_out, f_std = fm.apply(params, jnp.asarray(x), train=False)
        _cmp(k_out, f_out)
        _cmp(k_std, f_std)


class TestMultiDecoderBridge:
    def test_mdwf(self, ref):
        from ideal_gan_tpu.models import MDWFNet
        rng = np.random.default_rng(3)
        ne = 6
        x = rng.normal(size=(2, 32, 32, 2 * ne)).astype(np.float32)
        te = (rng.random(size=(2, ne)).astype(np.float32) * 8 + 1) * 1e-3
        km = ref.MDWF_Generator((32, 32, 2 * ne), te_input=True,
                                filters=8, num_layers=2)
        fm = MDWFNet(filters=8, num_layers=2, te_input=True)
        params = convert_mdwf_generator(km, fm, jnp.asarray(x),
                                        jnp.asarray(te))
        _cmp(km([x, te], training=False),
             fm.apply(params, jnp.asarray(x), jnp.asarray(te), train=False))

    def test_pm_generator_sup_non_me(self, ref):
        # the reference's DEFAULT sup config (G_model=multi-decod,
        # out_vars=WF/PM) builds the 2-decoder PM_Generator with
        # ME_layer=False on legacy 4-D input (train-sup.py:183-187);
        # sup.build_model must produce the matching Flax module and the
        # converter must map it (round-3 review: this path previously
        # returned the 3-decoder MDWFNet and could never convert)
        from ideal_gan_tpu.train import sup
        rng = np.random.default_rng(5)
        ne = 6
        x = rng.normal(size=(2, 32, 32, 2 * ne)).astype(np.float32)
        from ideal_gan_tpu.models import VETNet
        km = ref.PM_Generator((32, 32, 2 * ne), ME_layer=False,
                              filters=8, num_layers=2,
                              R2_self_attention=False,
                              FM_self_attention=True)
        built = sup.build_model({**sup.DEFAULTS, "out_vars": "PM",
                                 "n_G_filters": 8})
        assert isinstance(built, VETNet)
        assert not built.me_layer and not built.te_input
        assert not built.r2_self_attention and built.fm_self_attention
        fm = VETNet(me_layer=False, te_input=False, n_out=1, filters=8,
                    num_layers=2, r2_self_attention=False,
                    fm_self_attention=True)
        params = convert_pm_generator(km, fm, jnp.asarray(x))
        _cmp(km(x, training=False),
             fm.apply(params, jnp.asarray(x), train=False))

    def test_pm_generator_vet(self, ref):
        from ideal_gan_tpu.models import VETNet
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 6, 32, 32, 2)).astype(np.float32)
        te = (rng.random(size=(2, 6)).astype(np.float32) * 8 + 1) * 1e-3
        km = ref.PM_Generator((6, 32, 32, 2), ME_layer=True, te_input=True,
                              filters=8, num_layers=2)
        fm = VETNet(me_layer=True, te_input=True, filters=8, num_layers=2)
        params = convert_pm_generator(km, fm, jnp.asarray(x),
                                      jnp.asarray(te))
        _cmp(km([x, te], training=False),
             fm.apply(params, jnp.asarray(x), jnp.asarray(te), train=False))


class TestVAEBridge:
    def test_encoder(self, ref):
        from ideal_gan_tpu.models import Encoder
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 6, 32, 32, 2)).astype(np.float32)
        km = ref.encoder((6, 32, 32, 2), encoded_dims=8, filters=4,
                         num_layers=2, num_res_blocks=1, sd_out=False,
                         NL_self_attention=True)
        fm = Encoder(encoded_dims=8, filters=4, num_layers=2,
                     num_res_blocks=1, sd_out=False, nl_self_attention=True)
        params = convert_encoder(km, fm, jnp.asarray(x))
        _cmp(km(x, training=False),
             fm.apply(params, jnp.asarray(x), train=False))

    def test_decoder(self, ref):
        from ideal_gan_tpu.models import Decoder
        rng = np.random.default_rng(6)
        z = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
        km = ref.decoder(8, (32, 32, 2), filters=4, num_layers=2,
                         num_res_blocks=1, NL_self_attention=True)
        fm = Decoder(encoded_dims=8, n_out=2, filters=4, num_layers=2,
                     num_res_blocks=1, nl_self_attention=True)
        params = convert_decoder(km, fm, jnp.asarray(z))
        _cmp(km(z, training=False),
             fm.apply(params, jnp.asarray(z), train=False))

    def test_decoder_bayes_head(self, ref):
        """Flipout re/im-split head (DLlib/module.py:880-885) bridged via
        the tfp-layout shim; parity on the deterministic (mean-kernel)
        path — the Keras side is the refload Convolution2DFlipout shim
        whose forward IS the mean path, the Flax head runs
        deterministic=True at train=False."""
        from ideal_gan_tpu.models import Decoder
        rng = np.random.default_rng(8)
        z = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
        km = ref.decoder(8, (32, 32, 2), filters=4, num_layers=2,
                         num_res_blocks=1, NL_self_attention=True,
                         bayes_layer=True, output_activation="tanh")
        fm = Decoder(encoded_dims=8, n_out=2, filters=4, num_layers=2,
                     num_res_blocks=1, nl_self_attention=True,
                     bayes_layer=True, output_activation="tanh")
        params = convert_decoder(km, fm, jnp.asarray(z))
        _cmp(km(z, training=False),
             fm.apply(params, jnp.asarray(z), train=False))

    def test_decoder_bayes_sigma_mapping(self, ref):
        """σ layout transform: tfp stores untransformed_scale u with
        σ = eps + softplus(u); FlipoutConv stores log σ."""
        from ideal_gan_tpu.models import Decoder
        rng = np.random.default_rng(9)
        z = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
        km = ref.decoder(8, (32, 32, 2), filters=4, num_layers=2,
                         num_res_blocks=1, NL_self_attention=False,
                         bayes_layer=True, output_activation="tanh")
        fm = Decoder(encoded_dims=8, n_out=2, filters=4, num_layers=2,
                     num_res_blocks=1, nl_self_attention=False,
                     bayes_layer=True, output_activation="tanh")
        params = convert_decoder(km, fm, jnp.asarray(z))
        flip = [lyr for lyr in km.layers
                if lyr.__class__.__name__ == "Convolution2DFlipout"]
        u = np.asarray(flip[0].get_weights()[1])
        expect = np.log(np.finfo(np.float32).eps + np.logaddexp(0.0, u))
        got = np.asarray(
            params["params"]["FlipoutConv_0"]["kernel_log_sigma"])
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_bayes_decoder(self, ref):
        """Full Bayes_decoder (DLlib/module.py:894-938): every conv in
        both towers is Flipout. The Flax residual blocks sample Flipout
        perturbations even at eval (reference tfp semantics), so σ is
        silenced (log σ → −100) after conversion to compare the
        mean-kernel wiring exactly against the shim's deterministic
        forward."""
        import flax
        from ideal_gan_tpu.models import BayesDecoder
        from ideal_gan_tpu.bridge import convert_bayes_decoder
        rng = np.random.default_rng(10)
        z = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
        km = ref.Bayes_decoder(8, (32, 32), filters=4, num_layers=2,
                               num_res_blocks=1, NL_self_attention=True)
        fm = BayesDecoder(encoded_dims=8, filters=4, num_layers=2,
                          num_res_blocks=1, nl_self_attention=True)
        variables = convert_bayes_decoder(km, fm, jnp.asarray(z))
        flat = flax.traverse_util.flatten_dict(variables)
        flat = {k: (jnp.full_like(v, -100.0)
                    if k[-1] == "kernel_log_sigma" else v)
                for k, v in flat.items()}
        variables = flax.traverse_util.unflatten_dict(flat)
        out = fm.apply(variables, jnp.asarray(z), train=False,
                       rngs={"bayes": jax.random.PRNGKey(0)})
        _cmp(km(z, training=False), out)


class TestPatchGANBridge:
    def test_patchgan(self, ref):
        """Keras 3 normalizes SN kernels in place only during training
        calls; flax re-normalizes every forward (standard SN-GAN). Drive
        the Keras model to its power-iteration fixed point first — the
        state any trained checkpoint is in — then parity must hold."""
        from ideal_gan_tpu.models import PatchGAN
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        km = ref.PatchGAN((32, 32, 2), dim=8, n_downsamplings=2,
                          self_attention=True)
        for _ in range(64):  # converge kernel ← kernel/σ, u ← u₁
            km(x, training=True)
        fm = PatchGAN(dim=8, n_downsamplings=2, self_attention=True)
        variables = convert_patchgan(km, fm, jnp.asarray(x))
        _cmp(km(x, training=False),
             fm.apply(variables, jnp.asarray(x), train=False), atol=5e-4)


class TestCheckpointImport:
    def test_unsup_experiment_roundtrip(self, ref, tmp_path):
        """Full user path: reference-style experiment dir (settings.yml +
        tf.train.Checkpoint) → tools/import_reference_checkpoint.py →
        load_params_npz → identical Flax forward."""
        import yaml

        from ideal_gan_tpu.bridge import load_params_npz
        from ideal_gan_tpu.train import unsup
        from tools.import_reference_checkpoint import main as import_main

        hw, ne, filters = 32, 6, 4
        exp = tmp_path / "ref-run"
        (exp / "checkpoints").mkdir(parents=True)
        cfg = {"n_G_filters": filters, "data_size": hw, "n_echoes": ne,
               "D1_SelfAttention": True, "D2_SelfAttention": False}
        (exp / "settings.yml").write_text(yaml.safe_dump(cfg))

        g_fm_k = ref.UNet((None, hw, hw, 2), ME_layer=True, filters=filters,
                          self_attention=True)
        g_r2_k = ref.UNet((None, hw, hw, 1), ME_layer=True, filters=filters,
                          output_activation="sigmoid",
                          output_initializer="he_uniform",
                          self_attention=False)
        ckpt = tf.train.Checkpoint(G_A2B=g_fm_k, G_A2R2=g_r2_k)
        ckpt.save(str(exp / "checkpoints" / "ckpt"))

        out = tmp_path / "converted"
        import_main(["--experiment_dir", str(exp), "--family", "unsup",
                     "--out", str(out)])
        assert (out / "G_A2B.npz").exists()
        assert (out / "G_A2R2.npz").exists()

        rng = np.random.default_rng(8)
        x = rng.normal(size=(2, ne, hw, hw, 2)).astype(np.float32)
        g_fm, _ = unsup.build_models({**unsup.DEFAULTS,
                                      "n_G_filters": filters})
        params = load_params_npz(str(out / "G_A2B.npz"))
        # atol 1e-3 (not the module default 2e-4): TF's CPU conv/norm
        # reductions reassociate with thread scheduling, so the Keras
        # forward itself varies run-to-run by up to ~4e-4 here (observed
        # under suite load). The test guards converter wiring — a wrong
        # layout/gate mapping is an O(1) error, far above this tolerance.
        _cmp(g_fm_k(x, training=False),
             g_fm.apply(params, jnp.asarray(x), train=False), atol=1e-3)

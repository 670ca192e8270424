"""Generative model zoo tests: VAE encoder/decoders, discriminators, VQ,
complex nets, LDM denoiser, Fourier layer."""

import jax
import jax.numpy as jnp
import numpy as np

from ideal_gan_tpu.models import (
    BayesDecoder,
    ComplexBatchNorm,
    ComplexConv,
    CriticZ,
    Decoder,
    DenoiseUNet,
    Encoder,
    PatchGAN,
    PMComplex,
    SGAN,
    VectorQuantizer,
    cardioid,
    complex_max_pool_2x2,
    fourier_layer,
    zrelu,
)
from ideal_gan_tpu.prob import Normal

KEY = jax.random.PRNGKey(0)


class TestVAE:
    def test_encoder_posterior(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 6, 32, 32, 2)).astype(np.float32))
        enc = Encoder(encoded_dims=8, filters=4, num_layers=2,
                      num_res_blocks=1)
        variables = enc.init(KEY, x)
        out = enc.apply(variables, x)
        assert isinstance(out, Normal)
        assert out.loc.shape == (2, 8, 8, 8)
        z = out.sample(jax.random.PRNGKey(1))
        assert z.shape == (2, 8, 8, 8)
        kl = out.kl_to_std_normal()
        assert np.all(np.isfinite(np.asarray(kl)))

    def test_encoder_vq_mode(self):
        x = jnp.zeros((2, 6, 32, 32, 2))
        enc = Encoder(encoded_dims=8, filters=4, num_layers=2,
                      num_res_blocks=1, sd_out=False)
        variables = enc.init(KEY, x)
        out = enc.apply(variables, x)
        assert out.shape == (2, 8, 8, 8)

    def test_decoder(self):
        z = jnp.zeros((2, 8, 8, 4))
        dec = Decoder(encoded_dims=4, n_out=2, filters=4, num_layers=2,
                      num_res_blocks=1)
        variables = dec.init(KEY, z)
        out = dec.apply(variables, z)
        assert out.shape == (2, 1, 32, 32, 2)

    def test_decoder_bayes_layer(self):
        z = jnp.zeros((2, 8, 8, 4))
        dec = Decoder(encoded_dims=4, n_out=2, filters=4, num_layers=2,
                      num_res_blocks=1, bayes_layer=True)
        variables = dec.init({"params": KEY, "bayes": KEY}, z)
        out = dec.apply(variables, z, rngs={"bayes": KEY})
        assert out.shape == (2, 1, 32, 32, 2)

    def test_bayes_decoder(self):
        z = jnp.zeros((1, 8, 8, 4))
        dec = BayesDecoder(encoded_dims=4, filters=4, num_layers=2,
                           num_res_blocks=1)
        variables = dec.init({"params": KEY, "bayes": KEY}, z)
        out = dec.apply(variables, z, rngs={"bayes": KEY})
        assert out.shape == (1, 1, 32, 32, 2)


class TestDiscriminators:
    def test_patchgan(self):
        x = jnp.zeros((2, 64, 64, 2))
        d = PatchGAN(dim=8, n_downsamplings=2)
        variables = d.init(KEY, x)
        out, mut = d.apply(variables, x, mutable=["batch_stats"])
        assert out.shape[0] == 2 and out.shape[-1] == 1

    def test_patchgan_multi_echo(self):
        x = jnp.zeros((2, 6, 64, 64, 2))
        d = PatchGAN(dim=8, n_downsamplings=2, multi_echo=True)
        variables = d.init(KEY, x)
        out, _ = d.apply(variables, x, mutable=["batch_stats"])
        assert out.shape[0] == 12  # echoes folded into batch

    def test_patchgan_cgan(self):
        x = jnp.zeros((2, 64, 64, 2))
        d = PatchGAN(dim=8, n_downsamplings=2, cgan=True)
        variables = d.init(KEY, x, x)
        out, _ = d.apply(variables, x, x, mutable=["batch_stats"])
        assert out.shape[-1] == 1

    def test_spectral_norm_bounds_weights(self):
        """After several updates the top singular value of each conv kernel
        should be ≈1 on application."""
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 32, 32, 2)).astype(np.float32))
        d = PatchGAN(dim=8, n_downsamplings=2, self_attention=False)
        variables = d.init(KEY, x)
        state = variables
        for _ in range(8):
            out, mut = d.apply(state, x, mutable=["batch_stats"])
            state = {**state, "batch_stats": mut["batch_stats"]}
        assert np.all(np.isfinite(np.asarray(out)))

    def test_criticz(self):
        x = jnp.zeros((2, 16, 16, 8))
        d = CriticZ(dim=16, n_downsamplings=2)
        variables = d.init(KEY, x)
        out = d.apply(variables, x)
        assert out.shape[0] == 2

    def test_sgan_features_and_gen(self):
        x = jnp.zeros((2, 16, 16, 2))
        feat_model = SGAN(num_filters=4, num_layers=3)
        variables = feat_model.init(KEY, x)
        feats, _ = feat_model.apply(variables, x, mutable=["batch_stats"])
        assert len(feats) == 3
        gen = SGAN(gen_mode=True, num_filters=4, num_layers=3)
        gv = gen.init(KEY, x)
        out, _ = gen.apply(gv, x, mutable=["batch_stats"])
        assert out.shape == x.shape


class TestVQ:
    def test_straight_through_and_losses(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 4, 4, 8)).astype(np.float32))
        vq = VectorQuantizer(embedding_dim=8, num_embeddings=16)
        variables = vq.init(KEY, x)
        out, aux = vq.apply(variables, x, mutable=["losses", "metrics"])
        assert out.shape == x.shape
        # Quantized values come from the codebook.
        losses = jax.tree_util.tree_leaves(aux["losses"])
        assert losses and float(losses[-1]) > 0
        perp = jax.tree_util.tree_leaves(aux["metrics"])[-1]
        assert 1.0 <= float(perp) <= 16.0

    def test_gradient_passes_through(self):
        vq = VectorQuantizer(embedding_dim=4, num_embeddings=8)
        x = jnp.ones((1, 2, 2, 4))
        variables = vq.init(KEY, x)

        def loss(v):
            out, _ = vq.apply(variables, v, mutable=["losses", "metrics"])
            return jnp.sum(out)

        g = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(g), 1.0)  # identity via STE


class TestComplexNN:
    def test_complex_conv(self):
        z = jnp.ones((2, 8, 8, 3), jnp.complex64)
        m = ComplexConv(4)
        variables = m.init(KEY, z)
        out = m.apply(variables, z)
        assert out.shape == (2, 8, 8, 4) and out.dtype == jnp.complex64

    def test_activations(self):
        z = jnp.asarray([1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j], jnp.complex64)
        zr = np.asarray(zrelu(z))
        assert zr[0] == 1 + 1j and zr[1] == 0 and zr[3] == 0
        ca = np.asarray(cardioid(z))
        assert abs(ca[0]) > 0

    def test_complex_max_pool(self):
        z = np.zeros((1, 4, 4, 1), np.complex64)
        z[0, 0, 0, 0] = 3 + 4j   # |z|=5 wins its window
        z[0, 0, 1, 0] = 1 + 0j
        z[0, 2, 2, 0] = 0 - 2j
        out = np.asarray(complex_max_pool_2x2(jnp.asarray(z)))
        assert out.shape == (1, 2, 2, 1)
        assert out[0, 0, 0, 0] == 3 + 4j
        assert out[0, 1, 1, 0] == 0 - 2j

    def test_complex_bn_whitening(self):
        rng = np.random.default_rng(0)
        z = jnp.asarray((rng.normal(2, 3, (64, 8, 8, 2))
                         + 1j * rng.normal(-1, 0.5, (64, 8, 8, 2))
                         ).astype(np.complex64))
        bn = ComplexBatchNorm()
        variables = bn.init(KEY, z)
        out, _ = bn.apply(variables, z, mutable=["batch_stats"])
        # At init Γ=(1/√2)I, β=0 → output var(re)=var(im)≈1/2, decorrelated.
        o = np.asarray(out)
        assert abs(o.real.mean()) < 1e-2 and abs(o.imag.mean()) < 1e-2
        np.testing.assert_allclose(o.real.var(), 0.5, atol=5e-2)
        np.testing.assert_allclose(o.imag.var(), 0.5, atol=5e-2)

    def test_pm_complex_unet(self):
        z = jnp.ones((1, 16, 16, 2), jnp.complex64)
        m = PMComplex(filters=4, num_layers=2)
        variables = m.init(KEY, z)
        out, _ = m.apply(variables, z, mutable=["batch_stats"])
        assert out.shape == (1, 16, 16, 1) and out.dtype == jnp.complex64


class TestLDM:
    def test_denoise_unet(self):
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.asarray([1, 5])
        labels = jnp.asarray([0, 2])
        m = DenoiseUNet(dim=8, dim_mults=(1, 2), channels=3, num_classes=4,
                        in_res=16, resnet_block_groups=2)
        variables = m.init(KEY, x, t, labels)
        out = m.apply(variables, x, t, labels)
        assert out.shape == (2, 16, 16, 3)

    def test_time_conditioning_matters(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 16, 16, 3)).astype(np.float32))
        m = DenoiseUNet(dim=8, dim_mults=(1, 2), channels=3, num_classes=2,
                        in_res=16, resnet_block_groups=2)
        variables = m.init(KEY, x, jnp.asarray([1]), jnp.asarray([0]))
        o1 = m.apply(variables, x, jnp.asarray([1]), jnp.asarray([0]))
        o2 = m.apply(variables, x, jnp.asarray([100]), jnp.asarray([0]))
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


class TestFourier:
    def test_fft_roundtrip_energy(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 2)).astype(np.float32))
        out = fourier_layer(x)
        assert out.shape == x.shape
        # Parseval: energy scales by H*W under unnormalized FFT.
        e_in = np.sum(np.asarray(x) ** 2)
        e_out = np.sum(np.asarray(out) ** 2)
        np.testing.assert_allclose(e_out, e_in * 64, rtol=1e-4)

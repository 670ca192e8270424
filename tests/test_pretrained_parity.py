"""Weight-converter parity vs keras.applications (skipped without TF).

The zero-egress build cannot download ImageNet weights, so correctness of
the pretrained path is proven structurally: convert a keras model's
weights (random init — identical distribution of shapes/order as the
ImageNet file) through tools/convert_keras_weights.py, load them into the
Flax extractors, and assert the FEATURES MATCH the keras model on the same
input. Identical weights ⇒ identical features proves the layer mapping,
BN folding, and preprocessing are exactly right, so an ImageNet npz
produced by the same converter will reproduce the reference's extractors
(/root/reference/DLlib/metrics.py:9-53) bit-for-bit up to float error.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("tensorflow")
keras = pytest.importorskip("keras")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import convert_keras_weights as ckw  # noqa: E402


def test_vgg19_tap_features_match_keras(tmp_path):
    import jax.numpy as jnp

    from ideal_gan_tpu.eval.metrics import (VGG19Features, load_vgg19_npz)

    arrays = ckw.convert_vgg19(None)
    npz = tmp_path / "vgg19.npz"
    np.savez(npz, **arrays)

    model = keras.applications.VGG19(weights=None, include_top=False)
    # restore the converted arrays into keras so both sides share weights
    idx = 0
    for layer in model.layers:
        if layer.__class__.__name__ != "Conv2D":
            continue
        layer.set_weights([arrays[f"conv_{idx}_kernel"],
                           arrays[f"conv_{idx}_bias"]])
        idx += 1

    tap_names = ["block1_conv2", "block2_conv2", "block3_conv2",
                 "block4_conv2", "block5_conv2"]
    keras_taps = keras.Model(
        model.input, [model.get_layer(n).output for n in tap_names])

    rng = np.random.default_rng(0)
    x = rng.normal(scale=20.0, size=(2, 64, 64, 3)).astype(np.float32)

    ref = [np.asarray(t) for t in keras_taps(x)]
    flax_model = VGG19Features()
    ours = flax_model.apply(load_vgg19_npz(str(npz)), jnp.asarray(x))
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=1e-3)


def test_inception_v3_pooled_features_match_keras(tmp_path):
    import jax.numpy as jnp

    from ideal_gan_tpu.eval.inception import (InceptionV3Features,
                                              load_inception_npz)

    keras.utils.set_random_seed(7)
    model = keras.applications.InceptionV3(weights=None, include_top=False,
                                           pooling="avg")
    arrays = ckw.convert_inception_v3_from_model(model)
    npz = tmp_path / "inception_v3.npz"
    np.savez(npz, **arrays)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1.0, 1.0, size=(2, 139, 139, 3)).astype(np.float32)

    ref = np.asarray(model(x, training=False))
    flax_model = InceptionV3Features()
    ours = np.asarray(flax_model.apply(load_inception_npz(str(npz)),
                                       jnp.asarray(x)))
    assert ours.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-3)


def test_init_vgg19_autoloads_from_weights_dir(tmp_path, monkeypatch):
    from ideal_gan_tpu.eval import metrics

    arrays = {f"conv_{i}_kernel": np.zeros((3, 3, 3 if i == 0 else 1, 1),
                                           np.float32)
              for i in range(16)}
    # build a real (shape-correct) npz via the converter path instead
    arrays = ckw.convert_vgg19(None)
    np.savez(tmp_path / "vgg19.npz", **arrays)
    monkeypatch.setenv("IDEAL_GAN_TPU_WEIGHTS_DIR", str(tmp_path))
    model, variables = metrics.init_vgg19()
    k = np.asarray(variables["params"]["conv_0"]["kernel"])
    np.testing.assert_array_equal(k, arrays["conv_0_kernel"])

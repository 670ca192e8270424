"""Load the reference's Keras model zoo without its heavyweight deps.

The reference `DLlib` package (jpmeneses/IDEAL-GAN) imports
`tensorflow_addons` and `tensorflow_probability` at module scope, and its
`DLlib/__init__.py` imports `DLlib.metrics`, which downloads ImageNet
weights at import time. Neither tfa/tfp nor network egress is available
in a minimal conversion environment, so this module provides:

- `install_tf_shims()`: registers minimal `tensorflow_addons` /
  `tensorflow_probability` stand-ins (only the symbols the reference's
  model-building code touches) when the real packages are absent. The
  tfa shims delegate to Keras-3 built-ins with identical semantics:
  `InstanceNormalization` → `keras.layers.GroupNormalization(groups=-1)`
  (per-channel groups, ε=1e-3 — tfa's defaults), `SpectralNormalization`
  → `keras.layers.SpectralNormalization`.
- `load_reference_dlmodule(ref_root)`: imports `DLlib.module` (and its
  `bn` / `complex_utils` / `attention` siblings) directly, *bypassing*
  `DLlib/__init__.py` so `DLlib.metrics` never runs.

With a full reference installation (tfa + tfp + egress) none of this is
needed — build the Keras model normally and pass it to the converters.
"""

from __future__ import annotations

import importlib
import os
import sys
import types


def _make_tfa_shim():
    import keras

    class InstanceNormalization(keras.layers.GroupNormalization):
        """tfa.layers.InstanceNormalization ≡ GroupNormalization with one
        channel per group; tfa and keras 3 share the ε=1e-3 default."""

        def __init__(self, **kwargs):
            kwargs.setdefault("groups", -1)
            super().__init__(**kwargs)

    tfa = types.ModuleType("tensorflow_addons")
    tfa.layers = types.ModuleType("tensorflow_addons.layers")
    tfa.layers.InstanceNormalization = InstanceNormalization
    tfa.layers.SpectralNormalization = keras.layers.SpectralNormalization
    tfa.__shim__ = True
    return tfa


def _make_tfp_shim():
    """Enough tfp for `DLlib.module` to IMPORT (its Rician class
    subclasses tfd.Distribution at class-creation time) and to BUILD the
    reference architectures — including the Bayesian ones — so their
    weights can be bridged:

    - `Convolution2DFlipout`: a real Keras layer with tfp's exact
      variable layout (`kernel_posterior_loc`,
      `kernel_posterior_untransformed_scale`, `bias_posterior_loc` —
      tfp.layers.util.default_mean_field_normal_fn) whose forward is the
      deterministic mean-kernel path conv(x, loc)+bias. The Flipout
      perturbation/KL are omitted: sampling runs on the Flax side
      (models/bayes.py); the shim exists to build + bridge reference
      Bayes checkpoints (DLlib/module.py:880-884, 894-938).
    - `DistributionLambda`: pass-through returning its input tensor (the
      concatenated [loc, scale] head, DLlib/module.py:441-455) — it holds
      no weights; the Flax UNet returns a prob.Normal/Rician built from
      the same two convs.

    Distribution math (`tfp.distributions.Normal` etc.) stays
    unavailable — parity for those paths is scipy/analytic-oracle-based
    (COVERAGE.md LIMITS)."""

    def _unavailable(name):
        def _raise(*a, **k):
            raise NotImplementedError(
                f"tensorflow_probability shim: {name} requires the real "
                "tfp package")
        return _raise

    class Distribution:
        def __init__(self, *args, **kwargs):
            pass

    import keras

    class Convolution2DFlipout(keras.layers.Layer):
        """Deterministic stand-in for tfp.layers.Convolution2DFlipout:
        same constructor surface (as used by the reference), same
        get_weights() layout/order as tfp's mean-field posterior."""

        def __init__(self, filters, kernel_size, strides=1,
                     padding="valid", activation=None, **kwargs):
            kwargs.pop("kernel_posterior_fn", None)
            kwargs.pop("kernel_divergence_fn", None)
            super().__init__(**kwargs)
            self.filters = int(filters)
            self.kernel_size = (
                (kernel_size, kernel_size) if isinstance(kernel_size, int)
                else tuple(kernel_size))
            self.strides = strides
            self.padding = padding
            self.activation = (keras.activations.get(activation)
                               if not callable(activation) else activation)

        def build(self, input_shape):
            in_ch = int(input_shape[-1])
            kshape = self.kernel_size + (in_ch, self.filters)
            # tfp default_mean_field_normal_fn initializers
            self.kernel_posterior_loc = self.add_weight(
                name="kernel_posterior_loc", shape=kshape,
                initializer=keras.initializers.RandomNormal(stddev=0.1))
            self.kernel_posterior_untransformed_scale = self.add_weight(
                name="kernel_posterior_untransformed_scale", shape=kshape,
                initializer=keras.initializers.RandomNormal(mean=-3.0,
                                                            stddev=0.1))
            self.bias_posterior_loc = self.add_weight(
                name="bias_posterior_loc", shape=(self.filters,),
                initializer="zeros")

        def call(self, x):
            out = keras.ops.conv(x, self.kernel_posterior_loc,
                                 strides=self.strides,
                                 padding=str(self.padding).lower())
            out = out + self.bias_posterior_loc
            if self.activation is not None:
                out = self.activation(out)
            return out

    class DistributionLambda(keras.layers.Layer):
        """Weightless pass-through: returns the input tensor unchanged
        (the reference feeds it concat([loc, scale]))."""

        def __init__(self, make_distribution_fn=None, **kwargs):
            super().__init__(**kwargs)

        def call(self, x):
            return x

    tfp = types.ModuleType("tensorflow_probability")
    tfp.distributions = types.ModuleType(
        "tensorflow_probability.distributions")
    tfp.distributions.Distribution = Distribution
    tfp.distributions.NOT_REPARAMETERIZED = "NOT_REPARAMETERIZED"
    tfp.distributions.FULLY_REPARAMETERIZED = "FULLY_REPARAMETERIZED"
    for name in ("Normal", "Independent", "kl_divergence"):
        setattr(tfp.distributions, name, _unavailable(f"distributions.{name}"))
    tfp.bijectors = types.ModuleType("tensorflow_probability.bijectors")
    tfp.layers = types.ModuleType("tensorflow_probability.layers")
    tfp.layers.Convolution2DFlipout = Convolution2DFlipout
    tfp.layers.DistributionLambda = DistributionLambda
    for name in ("IndependentNormal", "KLDivergenceRegularizer"):
        setattr(tfp.layers, name, _unavailable(f"layers.{name}"))
    tfp.__shim__ = True
    return tfp


def install_tf_shims() -> None:
    """Register tfa/tfp shims in sys.modules when the real ones are
    missing. Idempotent; never shadows a real installation."""
    try:
        importlib.import_module("tensorflow_addons")
    except ImportError:
        sys.modules["tensorflow_addons"] = _make_tfa_shim()
    try:
        importlib.import_module("tensorflow_probability")
    except ImportError:
        tfp = _make_tfp_shim()
        sys.modules["tensorflow_probability"] = tfp
        sys.modules["tensorflow_probability.distributions"] = \
            tfp.distributions
        sys.modules["tensorflow_probability.layers"] = tfp.layers


def _keras3_tf_proxy():
    """The reference was written for TF2/Keras-2, where raw `tf.*` calls
    on symbolic tensors were legal inside functional-model construction
    (e.g. AdaIN's `tf.nn.moments`, PatchGAN's inline `tf.nn.leaky_relu`).
    Keras 3 rejects tf functions on KerasTensors, so this proxy stands in
    for the `tf` module global of the loaded reference modules: any op
    that may receive a KerasTensor at build time is routed through
    `keras.ops` (identical math); everything else delegates to real tf."""
    import keras
    import tensorflow as tf
    from keras import ops as K

    def _sym(x):
        return isinstance(
            x, keras.src.backend.common.keras_tensor.KerasTensor)

    class _NNProxy:
        def __getattr__(self, name):
            return getattr(tf.nn, name)

        @staticmethod
        def leaky_relu(x, alpha=0.2):
            if _sym(x):
                return K.leaky_relu(x, negative_slope=alpha)
            return tf.nn.leaky_relu(x, alpha=alpha)

        @staticmethod
        def moments(x, axes, keepdims=False, **kw):
            if _sym(x):
                return K.moments(x, axes, keepdims=keepdims)
            return tf.nn.moments(x, axes, keepdims=keepdims, **kw)

        @staticmethod
        def batch_normalization(x, mean, variance, offset, scale,
                                variance_epsilon):
            if _sym(x) or _sym(mean) or _sym(scale):
                out = (x - mean) / K.sqrt(variance + variance_epsilon)
                if scale is not None:
                    out = out * scale
                if offset is not None:
                    out = out + offset
                return out
            return tf.nn.batch_normalization(x, mean, variance, offset,
                                             scale, variance_epsilon)

    class _TFProxy:
        nn = _NNProxy()

        def __getattr__(self, name):
            return getattr(tf, name)

        @staticmethod
        def reshape(x, shape, **kw):
            return K.reshape(x, shape) if _sym(x) else tf.reshape(
                x, shape, **kw)

        @staticmethod
        def sqrt(x):
            return K.sqrt(x) if _sym(x) else tf.sqrt(x)

        @staticmethod
        def expand_dims(x, axis=None, **kw):
            return K.expand_dims(x, axis) if _sym(x) else tf.expand_dims(
                x, axis, **kw)

        @staticmethod
        def square(x):
            return K.square(x) if _sym(x) else tf.square(x)

        @staticmethod
        def concat(xs, axis, **kw):
            if any(_sym(x) for x in xs):
                return K.concatenate(xs, axis)
            return tf.concat(xs, axis, **kw)

    return _TFProxy()


def load_reference_dlmodule(ref_root: str = "/root/reference"):
    """Import the reference `DLlib.module` without executing
    `DLlib/__init__.py` (which would import DLlib.metrics and download
    ImageNet weights). Returns the module object. The loaded modules'
    `tf` global is swapped for a Keras-3 compatibility proxy (see
    `_keras3_tf_proxy`)."""
    install_tf_shims()
    # Pin TF numerics: the parity suites compare forwards at 2e-4 and
    # per-leaf grads at 0.5%, but TF's CPU conv/norm reductions
    # reassociate with thread scheduling and can move results by ~1e-2
    # relative between identical runs. Determinism makes the reference
    # side reproducible so the bounds measure the bridge, not TF's
    # scheduler. Idempotent; only affects ops executed afterwards.
    import tensorflow as tf
    try:
        tf.config.experimental.enable_op_determinism()
    except Exception:  # very old TF: keep going without the pin
        pass
    ref_root = os.path.abspath(ref_root)
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)  # wflib import inside DLlib.module
    if "DLlib" not in sys.modules:
        pkg = types.ModuleType("DLlib")
        pkg.__path__ = [os.path.join(ref_root, "DLlib")]
        pkg.__package__ = "DLlib"
        sys.modules["DLlib"] = pkg
    mod = importlib.import_module("DLlib.module")
    proxy = _keras3_tf_proxy()
    for name in ("DLlib.module", "DLlib.attention"):
        if name in sys.modules and getattr(sys.modules[name], "tf",
                                           None) is not proxy:
            sys.modules[name].tf = proxy
    return mod

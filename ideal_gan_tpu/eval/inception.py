"""InceptionV3 feature extractor (Flax) — the reference's FID embedding
network (DLlib/metrics.py:10,37-53 `get_features` uses keras
InceptionV3's pooled output).

ImageNet weights are not downloadable in the zero-egress TPU environment;
`init_inception_v3` gives a fixed-seed random initialization (a valid
random-projection embedding for relative FID comparisons — same policy as
the VGG19 extractor) and `load_inception_npz` loads converted weights from
an npz when available.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _ConvBN(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: int = 1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False)(x)
        # BN folded to per-channel affine (inference-only extractor).
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return nn.relu(x * scale + bias)


class _InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _ConvBN(64, (1, 1))(x)
        b2 = _ConvBN(48, (1, 1))(x)
        b2 = _ConvBN(64, (5, 5))(b2)
        b3 = _ConvBN(64, (1, 1))(x)
        b3 = _ConvBN(96, (3, 3))(b3)
        b3 = _ConvBN(96, (3, 3))(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = _ConvBN(self.pool_features, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class _InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = _ConvBN(384, (3, 3), strides=2, padding="VALID")(x)
        b2 = _ConvBN(64, (1, 1))(x)
        b2 = _ConvBN(96, (3, 3))(b2)
        b2 = _ConvBN(96, (3, 3), strides=2, padding="VALID")(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class _InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        b1 = _ConvBN(192, (1, 1))(x)
        b2 = _ConvBN(self.c7, (1, 1))(x)
        b2 = _ConvBN(self.c7, (1, 7))(b2)
        b2 = _ConvBN(192, (7, 1))(b2)
        b3 = _ConvBN(self.c7, (1, 1))(x)
        b3 = _ConvBN(self.c7, (7, 1))(b3)
        b3 = _ConvBN(self.c7, (1, 7))(b3)
        b3 = _ConvBN(self.c7, (7, 1))(b3)
        b3 = _ConvBN(192, (1, 7))(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = _ConvBN(192, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class _InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = _ConvBN(192, (1, 1))(x)
        b1 = _ConvBN(320, (3, 3), strides=2, padding="VALID")(b1)
        b2 = _ConvBN(192, (1, 1))(x)
        b2 = _ConvBN(192, (1, 7))(b2)
        b2 = _ConvBN(192, (7, 1))(b2)
        b2 = _ConvBN(192, (3, 3), strides=2, padding="VALID")(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class _InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = _ConvBN(320, (1, 1))(x)
        b2 = _ConvBN(384, (1, 1))(x)
        b2 = jnp.concatenate([_ConvBN(384, (1, 3))(b2),
                              _ConvBN(384, (3, 1))(b2)], axis=-1)
        b3 = _ConvBN(448, (1, 1))(x)
        b3 = _ConvBN(384, (3, 3))(b3)
        b3 = jnp.concatenate([_ConvBN(384, (1, 3))(b3),
                              _ConvBN(384, (3, 1))(b3)], axis=-1)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = _ConvBN(192, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3Features(nn.Module):
    """InceptionV3 trunk → global-average-pooled 2048-d features."""

    @nn.compact
    def __call__(self, x):
        # stem
        x = _ConvBN(32, (3, 3), strides=2, padding="VALID")(x)
        x = _ConvBN(32, (3, 3), padding="VALID")(x)
        x = _ConvBN(64, (3, 3))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = _ConvBN(80, (1, 1), padding="VALID")(x)
        x = _ConvBN(192, (3, 3), padding="VALID")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = _InceptionA(32)(x)
        x = _InceptionA(64)(x)
        x = _InceptionA(64)(x)
        x = _InceptionB()(x)
        for c7 in (128, 160, 160, 192):
            x = _InceptionC(c7)(x)
        x = _InceptionD()(x)
        x = _InceptionE()(x)
        x = _InceptionE()(x)
        return jnp.mean(x, axis=(1, 2))  # (n, 2048)


def inception_preprocess(x_rgb01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB → [-1,1] (keras inception_v3.preprocess_input on 255-range
    inputs)."""
    return x_rgb01 * 2.0 - 1.0


def init_inception_v3(key=None):
    """InceptionV3 feature extractor. Loads converted ImageNet weights
    when a `weights/inception_v3.npz` artifact exists; otherwise falls
    back to a fixed-seed random init with a logged warning (FID against
    random features is relative-only)."""
    from .metrics import weights_path
    model = InceptionV3Features()
    path = weights_path("inception_v3.npz")
    if path is not None:
        return model, load_inception_npz(path)
    import logging
    logging.getLogger(__name__).warning(
        "InceptionV3: no pretrained weights found "
        "(weights/inception_v3.npz) — using fixed-seed RANDOM init; FID "
        "values are relative only. Run tools/convert_keras_weights.py "
        "to ship real weights.")
    key = key if key is not None else jax.random.PRNGKey(4321)
    variables = model.init(key, jnp.zeros((1, 139, 139, 3)))
    return model, variables


def load_inception_npz(path: str):
    """Load converted weights from npz (param-path → array)."""
    data = np.load(path, allow_pickle=True)
    import flax
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return {"params": flax.traverse_util.unflatten_dict(flat)}


def echoes_to_inception_input(x: jnp.ndarray, size: int = 139) -> jnp.ndarray:
    """MEBCRN echoes → inception input, reference channel recipe
    (DLlib/metrics.py:41-43): [re·0.5+0.5, |z|, im·0.5+0.5]."""
    if x.ndim == 5:
        x = x.reshape((-1,) + x.shape[2:])
    n, h, w, _ = x.shape
    x = jax.image.resize(x, (n, size, size, 2), method="lanczos3",
                         antialias=True)
    mag = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    rgb01 = jnp.concatenate([x[..., :1] * 0.5 + 0.5, mag,
                             x[..., 1:2] * 0.5 + 0.5], axis=-1)
    return inception_preprocess(rgb01)

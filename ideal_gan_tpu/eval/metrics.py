"""Generative quality metrics (rebuild of DLlib/metrics.py).

- `vgg_features` / `VGG19Features`: multi-layer VGG19 feature extractor
  used by the perceptual cycle loss (DLlib/metrics.py:12-34). The reference
  downloads ImageNet weights at import; in the zero-egress TPU environment
  weights are loaded from a local npz via `load_vgg19_npz` when available,
  else a fixed-seed random init is used (a random multi-scale projection —
  still a valid perceptual-style loss/embedding for relative comparisons;
  documented divergence).
- `perceptual_cosine_loss`: the GAN trainer's multi-layer cosine distance
  (train-IDEAL-GAN.py:264-269).
- `frechet_distance` + `FIDAccumulator` (fixes the reference's inverted
  epsilon branch, DLlib/metrics.py:84 — documented), `mmd_linear`,
  `covariance_map` (CoVar layer), and SSIM/MS-SSIM.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# VGG19 feature extractor
# ---------------------------------------------------------------------------

_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# Keras layer indices [2,5,8,13,18] → convs (block1_conv2, block2_conv2,
# block3_conv2, block4_conv2, block5_conv2) in this flat conv ordering:
_DEFAULT_TAPS = (1, 3, 5, 9, 13)

_IMAGENET_MEAN_BGR = np.array([103.939, 116.779, 123.68], np.float32)


class VGG19Features(nn.Module):
    """VGG19 conv trunk returning the feature maps at `taps` (indices into
    the flat conv list). Input: (n, H, W, 3) in caffe-style BGR-mean-
    subtracted range (use `vgg_preprocess`)."""

    taps: Sequence[int] = _DEFAULT_TAPS

    @nn.compact
    def __call__(self, x):
        feats = []
        conv_idx = 0
        for v in _VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), name=f"conv_{conv_idx}")(x)
            x = nn.relu(x)
            if conv_idx in self.taps:
                feats.append(x)
            conv_idx += 1
        return feats


def vgg_preprocess(x_rgb01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB → caffe BGR with ImageNet means subtracted
    (keras.applications.vgg19.preprocess_input semantics)."""
    x = 255.0 * x_rgb01
    x_bgr = x[..., ::-1]
    return x_bgr - _IMAGENET_MEAN_BGR


def weights_path(name: str):
    """Resolve a converted-weights npz: $IDEAL_GAN_TPU_WEIGHTS_DIR/<name>
    or <repo>/weights/<name>. Returns None when absent (zero-egress
    environments without a shipped weights artifact)."""
    import os
    from pathlib import Path
    cands = []
    env = os.environ.get("IDEAL_GAN_TPU_WEIGHTS_DIR")
    if env:
        cands.append(Path(env) / name)
    cands.append(Path(__file__).resolve().parents[2] / "weights" / name)
    for c in cands:
        if c.exists():
            return str(c)
    return None


def load_vgg19_npz(path: str):
    """Load VGG19 conv weights from an npz with arrays conv_{i}_kernel /
    conv_{i}_bias (HWIO kernels) — produced by
    tools/convert_keras_weights.py."""
    data = np.load(path)
    params = {}
    for i in range(16):
        params[f"conv_{i}"] = {
            "kernel": jnp.asarray(data[f"conv_{i}_kernel"]),
            "bias": jnp.asarray(data[f"conv_{i}_bias"]),
        }
    return {"params": params}


def feature_source(name: str = "vgg19") -> str:
    """Provenance of the feature extractor weights: ``"imagenet"`` when a
    converted artifact exists, else ``"random-init"``. Consumers MUST tag
    metric outputs with this — random-feature FID is relative-only and
    must never be mistaken for literature-comparable FID."""
    return "imagenet" if weights_path(f"{name}.npz") is not None \
        else "random-init"


def init_vgg19(key=None, taps: Sequence[int] = _DEFAULT_TAPS):
    """VGG19 feature extractor. Loads converted ImageNet weights when a
    `weights/vgg19.npz` artifact exists (reference behavior,
    DLlib/metrics.py:9); otherwise falls back to a fixed-seed random init
    (a random multi-scale projection — valid only for relative
    comparisons) and says so. Returns (module, variables)."""
    model = VGG19Features(taps=tuple(taps))
    path = weights_path("vgg19.npz")
    if path is not None:
        return model, load_vgg19_npz(path)
    import logging
    logging.getLogger(__name__).warning(
        "VGG19: no pretrained weights found (weights/vgg19.npz) — using "
        "fixed-seed RANDOM init; perceptual losses/metrics are relative "
        "only. Run tools/convert_keras_weights.py to ship real weights.")
    key = key if key is not None else jax.random.PRNGKey(1234)
    variables = model.init(key, jnp.zeros((1, 64, 64, 3)))
    return model, variables


def resize_to(x: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Antialiased resize to (size, size) (the reference uses lanczos5;
    jax.image supports lanczos3/linear — lanczos3 used)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size, size, c), method="lanczos3",
                            antialias=True)


def echoes_to_vgg_input(x: jnp.ndarray, only_mag: bool = False,
                        size: int = 224) -> jnp.ndarray:
    """MEBCRN echoes (nb, ne, H, W, 2) → VGG input: fold echoes into batch,
    resize, and build 3 channels from (re, re, im) shifted to [0,1] — or
    magnitude triplicated (DLlib/metrics.py:14-27)."""
    if x.ndim == 5:
        x = x.reshape((-1,) + x.shape[2:])
    x = resize_to(x, size)
    if only_mag:
        mag = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
        rgb01 = jnp.concatenate([mag, mag, mag], axis=-1)
    else:
        r = x[..., :1] * 0.5 + 0.5
        i = x[..., 1:2] * 0.5 + 0.5
        rgb01 = jnp.concatenate([r, r, i], axis=-1)
    return vgg_preprocess(rgb01)


def perceptual_cosine_loss(feats_a: Sequence[jnp.ndarray],
                           feats_b: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Mean (1 − cosine similarity) across feature layers
    (train-IDEAL-GAN.py:264-269 uses keras CosineSimilarity per layer)."""
    total = 0.0
    for fa, fb in zip(feats_a, feats_b):
        fa = fa.reshape(fa.shape[0], -1)
        fb = fb.reshape(fb.shape[0], -1)
        na = jnp.linalg.norm(fa, axis=1) + 1e-8
        nb_ = jnp.linalg.norm(fb, axis=1) + 1e-8
        cos = jnp.sum(fa * fb, axis=1) / (na * nb_)
        total = total + jnp.mean(1.0 - cos)
    return total / len(feats_a)


# ---------------------------------------------------------------------------
# FID / MMD / CoVar
# ---------------------------------------------------------------------------

def frechet_distance(mu_x, sigma_x, mu_y, sigma_y,
                     epsilon: float = 1e-6) -> float:
    """FID between Gaussians (DLlib/metrics.py:78-91). Host-side numpy:
    sqrtm via scipy. Fixes the reference's inverted singularity check
    (it added the epsilon offset when the product was *finite*)."""
    from scipy import linalg as sla
    mu_x, sigma_x = np.asarray(mu_x), np.asarray(sigma_x)
    mu_y, sigma_y = np.asarray(mu_y), np.asarray(sigma_y)
    diff = mu_x - mu_y
    prod = sigma_x @ sigma_y
    covmean, _ = sla.sqrtm(prod, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma_x.shape[0]) * epsilon
        covmean, _ = sla.sqrtm((sigma_x + offset) @ (sigma_y + offset),
                               disp=False)
    covmean = np.real(covmean)
    return float(diff @ diff + np.trace(sigma_x) + np.trace(sigma_y)
                 - 2.0 * np.trace(covmean))


class FIDAccumulator:
    """Streaming FID: accumulate feature batches, compute at the end
    (replaces the reference's stateful keras metric)."""

    def __init__(self):
        self._real = []
        self._fake = []

    def update(self, real_feats, fake_feats):
        self._real.append(np.asarray(real_feats))
        self._fake.append(np.asarray(fake_feats))

    def result(self) -> float:
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        return frechet_distance(real.mean(0), np.cov(real, rowvar=False),
                                fake.mean(0), np.cov(fake, rowvar=False))


def mmd_linear(y_true: jnp.ndarray, y_pred: jnp.ndarray, beta: float = 1.0,
               gamma: float = 2.0) -> jnp.ndarray:
    """Linear-kernel MMD (DLlib/metrics.py:111-136)."""
    yt = y_true.reshape(y_true.shape[0], -1).astype(jnp.float32)
    yp = y_pred.reshape(y_pred.shape[0], -1).astype(jnp.float32)
    d = yt.shape[1]
    k_tt = (yt @ yt.T) / d
    k_pp = (yp @ yp.T) / d
    k_pt = (yp @ yt.T) / d
    return beta * (jnp.mean(k_tt) + jnp.mean(k_pp)) - gamma * jnp.mean(k_pt)


def covariance_map(x: jnp.ndarray) -> jnp.ndarray:
    """Latent covariance for the whitening regularizer (reference CoVar,
    DLlib/metrics.py:199-209): flatten per sample, batch-mean outer product
    of the centered vectors; returns (1, D, D)."""
    x = x.reshape(x.shape[0], -1)
    mu = jnp.mean(x, axis=0, keepdims=True)
    d = (x - mu)[..., None]
    cov = d @ jnp.swapaxes(d, -1, -2)
    return jnp.mean(cov, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# SSIM / MS-SSIM
# ---------------------------------------------------------------------------

def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def _filter2d(x: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid-conv of NHWC with a 2-D kernel."""
    c = x.shape[-1]
    k = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5, k1: float = 0.01,
         k2: float = 0.03, return_cs: bool = False):
    """Per-batch-element SSIM over NHWC images (tf.image.ssim semantics)."""
    kern = _gaussian_kernel(kernel_size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_a = _filter2d(a, kern)
    mu_b = _filter2d(b, kern)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _filter2d(a * a, kern) - mu_aa
    var_b = _filter2d(b * b, kern) - mu_bb
    cov = _filter2d(a * b, kern) - mu_ab
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    lum = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    ssim_map = lum * cs
    axes = (1, 2, 3)
    if return_cs:
        return jnp.mean(ssim_map, axes), jnp.mean(cs, axes)
    return jnp.mean(ssim_map, axes)


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
            weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)) -> jnp.ndarray:
    """Multi-scale SSIM (tf.image.ssim_multiscale semantics)."""
    weights = jnp.asarray(weights)
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = ssim(a, b, max_val, return_cs=True)
        vals.append(jnp.maximum(s if i == levels - 1 else cs, 0.0))
        if i < levels - 1:
            a = nn.avg_pool(a, (2, 2), strides=(2, 2))
            b = nn.avg_pool(b, (2, 2), strides=(2, 2))
    vals = jnp.stack(vals)  # (levels, nb)
    return jnp.prod(vals ** weights[:, None], axis=0)

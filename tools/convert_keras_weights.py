"""Convert keras.applications VGG19 / InceptionV3 weights to the npz
formats consumed by `ideal_gan_tpu.eval.metrics.load_vgg19_npz` and
`ideal_gan_tpu.eval.inception.load_inception_npz`.

The reference downloads ImageNet weights at import
(/root/reference/DLlib/metrics.py:9-10); this environment has no network
egress, so the conversion is split out: run this script once wherever the
Keras weight cache exists (or pass --weights <path.h5>) and ship the npz
files. The extractors auto-load them from `weights/` at the repo root (or
$IDEAL_GAN_TPU_WEIGHTS_DIR).

    python tools/convert_keras_weights.py --out weights/          # imagenet
    python tools/convert_keras_weights.py --weights none --out /tmp/rand

`--weights none` converts a fresh random initialization — useless for FID
quality but exactly what the parity test uses to prove the layer mapping
is correct (identical weights ⇒ identical features), so ImageNet weights
will load correctly whenever they are provided.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _natural_key(path_tuple):
    """Sort flax param paths in module-creation (call) order: split each
    component's trailing index and compare (name, int)."""
    key = []
    for comp in path_tuple:
        m = re.match(r"^(.*?)(\d+)$", comp)
        if m:
            key.append((m.group(1), int(m.group(2))))
        else:
            key.append((comp, -1))
    return key


def convert_vgg19(weights: str | None) -> dict:
    """keras VGG19 conv trunk → {conv_{i}_kernel, conv_{i}_bias}."""
    from keras.applications import VGG19
    model = VGG19(weights=weights, include_top=False)
    out = {}
    idx = 0
    for layer in model.layers:
        if layer.__class__.__name__ != "Conv2D":
            continue
        kernel, bias = layer.get_weights()
        out[f"conv_{idx}_kernel"] = kernel.astype(np.float32)
        out[f"conv_{idx}_bias"] = bias.astype(np.float32)
        idx += 1
    assert idx == 16, f"expected 16 VGG19 convs, found {idx}"
    return out


def convert_inception_v3(weights: str | None) -> dict:
    from keras.applications import InceptionV3
    return convert_inception_v3_from_model(
        InceptionV3(weights=weights, include_top=False))


def convert_inception_v3_from_model(model) -> dict:
    """keras InceptionV3 → flat {flax-path: array} with BN folded into the
    per-channel (scale, bias) affine of `inception._ConvBN`.

    Mapping relies on conv creation order being identical in both
    implementations (keras builds branches in source order; flax numbers
    submodules in call order) — asserted structurally here and numerically
    by tests/test_pretrained_parity.py.
    """
    import jax
    import jax.numpy as jnp

    from ideal_gan_tpu.eval.inception import InceptionV3Features

    # keras convs + their BNs: every IV3 conv is immediately followed by a
    # BN created in the same call (keras.src.applications.inception_v3
    # conv2d_bn), so the i-th-CREATED Conv2D pairs with the i-th-CREATED
    # BatchNormalization. model.layers is topologically ordered (branches
    # interleave), so recover creation order from the auto-generated name
    # suffix ("conv2d", "conv2d_1", ...).
    def _creation_idx(layer):
        parts = layer.name.rsplit("_", 1)
        return int(parts[1]) if len(parts) == 2 and parts[1].isdigit() else 0

    convs = sorted((l for l in model.layers
                    if l.__class__.__name__ == "Conv2D"), key=_creation_idx)
    bns = sorted((l for l in model.layers
                  if l.__class__.__name__ == "BatchNormalization"),
                 key=_creation_idx)
    assert len(convs) == len(bns) == 94, (
        f"expected 94 conv/BN pairs, got {len(convs)}/{len(bns)}")
    keras_pairs = list(zip(convs, bns))

    # flax param paths in call order.
    import flax
    flax_model = InceptionV3Features()
    variables = flax_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 139, 139, 3)))
    flat = flax.traverse_util.flatten_dict(variables["params"])
    conv_paths = sorted(
        {p[:-2] for p in flat if p[-2].startswith("Conv")},
        key=_natural_key)
    assert len(conv_paths) == len(keras_pairs), (
        f"flax has {len(conv_paths)} convs, keras {len(keras_pairs)}")

    out = {}
    for path, (conv, bn) in zip(conv_paths, keras_pairs):
        kernel = conv.get_weights()[0].astype(np.float32)
        expected = flat[path + ("Conv_0", "kernel")].shape
        assert kernel.shape == tuple(expected), (
            f"{'/'.join(path)}: kernel {kernel.shape} != flax {expected} "
            f"(keras layer {conv.name})")
        # keras IV3 BN: scale=False (γ=1), center=True.
        beta = (np.asarray(bn.beta) if bn.beta is not None
                else np.zeros(kernel.shape[-1], np.float32))
        mean = np.asarray(bn.moving_mean)
        var = np.asarray(bn.moving_variance)
        inv_std = 1.0 / np.sqrt(var + bn.epsilon)
        out["/".join(path + ("Conv_0", "kernel"))] = kernel
        out["/".join(path + ("scale",))] = inv_std.astype(np.float32)
        out["/".join(path + ("bias",))] = (
            beta - mean * inv_std).astype(np.float32)
    return out


def _write(path: Path, arrays: dict):
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)
    digest = hashlib.sha256(path.read_bytes()).hexdigest()
    print(f"wrote {path} ({path.stat().st_size/1e6:.1f} MB, "
          f"sha256={digest[:16]}…)")
    return digest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="imagenet",
                    help="'imagenet', 'none' (random init), or a .h5 path")
    ap.add_argument("--out", default=str(REPO / "weights"))
    ap.add_argument("--models", default="vgg19,inception_v3")
    args = ap.parse_args()
    weights = None if args.weights == "none" else args.weights

    out_dir = Path(args.out)
    manifest = {"source_weights": args.weights, "files": {}}
    if "vgg19" in args.models:
        digest = _write(out_dir / "vgg19.npz", convert_vgg19(weights))
        manifest["files"]["vgg19.npz"] = digest
    if "inception_v3" in args.models:
        digest = _write(out_dir / "inception_v3.npz",
                        convert_inception_v3(weights))
        manifest["files"]["inception_v3.npz"] = digest
    (out_dir / "MANIFEST.json").write_text(json.dumps(manifest, indent=2)
                                           + "\n")
    print(f"wrote {out_dir / 'MANIFEST.json'}")


if __name__ == "__main__":
    main()

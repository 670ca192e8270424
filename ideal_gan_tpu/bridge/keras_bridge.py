"""Keras→Flax weight converters for the reference model zoo.

Each `convert_*` function takes a built reference Keras model
(DLlib/module.py:345-938 — UNet :345-462, MDWF_Generator :465-569,
PM_Generator :572-686, encoder :781-838, decoder :841-891, PatchGAN
:266-317) plus the equivalent `ideal_gan_tpu.models` Flax module, and
returns a Flax variables dict whose forward pass matches the Keras model
bit-for-bit (up to f32 accumulation order).

Mechanics
---------
Keras auto-names layers with per-class creation counters
(`conv2d`, `conv2d_1`, …), so a per-class, creation-ordered cursor
(`_LayerPool`) recovers the exact construction sequence of the reference
source. The Flax side is addressed by explicit param paths (module
naming is deterministic under `@nn.compact`). Every assignment
shape-checks against the Flax template and the conversion fails loudly
on any unconsumed or unfilled parameter — a mapping slip cannot pass
silently.

Layout transforms:
- Conv2D kernels are HWIO in both frameworks — copied as-is.
- Conv2DTranspose: Keras stores (kh, kw, out, in) and computes the
  gradient-style transposed conv; Flax `nn.ConvTranspose` applies the
  kernel directly in a fractionally-strided conv — the mapping is
  swap(io) + flip(spatial), verified to 0 ulp in the bridge tests.
- ConvLSTM2D / LSTM gates: Keras packs [i, f, c, o] along the last axis;
  the Flax `ConvLSTM` uses one packed conv in the same order, while
  `nn.OptimizedLSTMCell` uses per-gate Dense modules (`ii…ho`) that the
  converter slices out (input kernels have no bias; the single Keras
  bias lands on the hidden-path gates).
- Instance/Layer/Batch norm: γ→scale, β→bias (ε=1e-3 matched by
  `models.blocks.Norm`).
- SpectralNormalization: the wrapped layer's *current* kernel is copied
  and the Flax power-iteration state is seeded with σ=1 and the Keras
  `vector_u`, reproducing Keras' inference behavior (Keras normalizes
  into the kernel during training; at inference it applies the stored
  kernel as-is).
"""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np

__all__ = [
    "convert_unet", "convert_mdwf_generator", "convert_pm_generator",
    "convert_encoder", "convert_decoder", "convert_bayes_decoder",
    "convert_patchgan", "save_params_npz", "load_params_npz",
]


def save_params_npz(path: str, variables) -> None:
    """Serialize a Flax variables dict (any collections) to npz with
    '§'-joined path keys (module names may themselves contain '/' —
    e.g. flax SpectralNorm state — so '/' cannot be the separator)."""
    import flax
    flat = flax.traverse_util.flatten_dict(variables)
    np.savez(path, **{"§".join(k): np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: str):
    """Inverse of `save_params_npz`: returns the variables dict, ready for
    `module.apply(variables, ...)`."""
    import flax
    import jax.numpy as jnp
    data = np.load(path)
    flat = {tuple(k.split("§")): jnp.asarray(v) for k, v in data.items()}
    return flax.traverse_util.unflatten_dict(flat)

_NORM_CLASSES = {
    "instance_norm": "InstanceNormalization",
    "batch_norm": "BatchNormalization",
    "layer_norm": "LayerNormalization",
}
_NORM_FLAX = {
    "instance_norm": "GroupNorm_0",
    "batch_norm": "BatchNorm_0",
    "layer_norm": "LayerNorm_0",
}


def _creation_idx(layer) -> int:
    m = re.match(r"^.*?_(\d+)$", layer.name)
    return int(m.group(1)) if m else 0


class _LayerPool:
    """Per-class, creation-ordered cursors over a Keras model's layers
    (Sequential wrappers — the reference's Interpol_Conv upsample — are
    flattened into their sublayers)."""

    def __init__(self, model):
        layers = []

        def add(ls):
            for lyr in ls:
                if lyr.__class__.__name__ == "Sequential":
                    add(lyr.layers)
                else:
                    layers.append(lyr)

        add(model.layers)
        self.by_cls = defaultdict(list)
        for lyr in layers:
            self.by_cls[lyr.__class__.__name__].append(lyr)
        for cls in self.by_cls:
            self.by_cls[cls].sort(key=_creation_idx)
        self._cursor = defaultdict(int)

    def take(self, cls):
        i = self._cursor[cls]
        self._cursor[cls] = i + 1
        pool = self.by_cls.get(cls, [])
        if i >= len(pool):
            raise ValueError(f"keras model has no {cls} layer #{i} — "
                             "architecture mismatch")
        return pool[i]

    def rest(self, cls):
        """Remaining (unconsumed) layers of a class, creation-ordered;
        marks them all consumed."""
        i = self._cursor[cls]
        pool = self.by_cls.get(cls, [])
        self._cursor[cls] = len(pool)
        return pool[i:]

    def assert_consumed(self, classes):
        for cls in classes:
            n, i = len(self.by_cls.get(cls, [])), self._cursor[cls]
            if i != n:
                raise ValueError(
                    f"{n - i} unconsumed {cls} layer(s) — the keras model "
                    "has more weights than the flax architecture")


class _Assembler:
    """Fills a Flax variables template (all collections) path-by-path with
    shape checking; `finish` fails on any unfilled parameter."""

    def __init__(self, template):
        import flax
        import jax.numpy as jnp
        self._jnp = jnp
        # 'losses' holds per-call sown values (FlipoutConv KL), not
        # weights — excluded from the conversion contract
        self.flat = {k: v
                     for k, v in flax.traverse_util.flatten_dict(
                         template).items()
                     if k[0] != "losses"}
        self.out = {}

    def put(self, path, arr):
        path = tuple(path)
        if path not in self.flat:
            near = [p for p in self.flat if p[:2] == path[:2]][:6]
            raise KeyError(f"no flax param {'/'.join(path)}; nearby: "
                           f"{['/'.join(p) for p in near]}")
        arr = np.asarray(arr)
        exp = tuple(self.flat[path].shape)
        if tuple(arr.shape) != exp:
            raise ValueError(f"{'/'.join(path)}: keras weight shape "
                             f"{tuple(arr.shape)} != flax {exp}")
        self.out[path] = self._jnp.asarray(arr, self.flat[path].dtype)

    def keep(self, path):
        """Retain the template's value (for state the Keras model does not
        carry, e.g. spectral-norm u when converting unwrapped convs)."""
        path = tuple(path)
        self.out[path] = self.flat[path]

    def finish(self):
        import flax
        missing = [p for p in self.flat if p not in self.out]
        if missing:
            raise ValueError("unfilled flax params: "
                             + ", ".join("/".join(p) for p in missing[:10]))
        return flax.traverse_util.unflatten_dict(self.out)


# --------------------------------------------------------------------------
# primitive weight mappers
# --------------------------------------------------------------------------

def _conv_t_kernel(k):
    """Keras Conv2DTranspose (kh, kw, out, in) → Flax ConvTranspose
    (kh, kw, in, out): swap io + flip spatial (gradient-conv vs direct
    fractionally-strided conv)."""
    return np.transpose(k, (0, 1, 3, 2))[::-1, ::-1]


def _put_conv(asm, base, kl):
    asm.put(base + ("kernel",), kl.kernel)
    if kl.use_bias:
        asm.put(base + ("bias",), kl.bias)


def _put_conv_t(asm, base, kl):
    asm.put(base + ("kernel",), _conv_t_kernel(np.asarray(kl.kernel)))
    if kl.use_bias:
        asm.put(base + ("bias",), kl.bias)


def _put_norm(asm, base, kl, kind):
    """base addresses the models.blocks.Norm module instance."""
    if kind == "none":
        return
    inner = base + (_NORM_FLAX[kind],)
    params = ("params",) + inner[1:]
    asm.put(params + ("scale",), kl.gamma)
    asm.put(params + ("bias",), kl.beta)
    if kind == "batch_norm":
        stats = ("batch_stats",) + inner[1:]
        asm.put(stats + ("mean",), kl.moving_mean)
        asm.put(stats + ("var",), kl.moving_variance)


def _put_conv_block(asm, pool, base, kind):
    """_conv2d_block (DLlib/module.py:162-199) → models.blocks.ConvBlock."""
    norm_cls = _NORM_CLASSES.get(kind)
    _put_conv(asm, base + ("Conv_0",), pool.take("Conv2D"))
    if norm_cls:
        _put_norm(asm, base + ("Norm_0",), pool.take(norm_cls), kind)
    _put_conv(asm, base + ("Conv_1",), pool.take("Conv2D"))
    if norm_cls:
        _put_norm(asm, base + ("Norm_1",), pool.take(norm_cls), kind)


def _put_residual_block(asm, pool, base, kind):
    """_residual_block (DLlib/module.py:202-220) → blocks.ResidualBlock."""
    norm_cls = _NORM_CLASSES.get(kind)
    _put_conv(asm, base + ("Conv_0",), pool.take("Conv2D"))
    if norm_cls:
        _put_norm(asm, base + ("Norm_0",), pool.take(norm_cls), kind)
    _put_conv(asm, base + ("Conv_1",), pool.take("Conv2D"))
    if norm_cls:
        _put_norm(asm, base + ("Norm_1",), pool.take(norm_cls), kind)


def _put_flipout(asm, base, kl):
    """tfp Convolution2DFlipout [kernel_posterior_loc,
    kernel_posterior_untransformed_scale, bias_posterior_loc]
    (tfp.layers.util.default_mean_field_normal_fn layout; same order from
    the refload shim) → models.bayes.FlipoutConv. tfp's posterior scale
    is eps + softplus(u); FlipoutConv stores log σ, so
    log_sigma = log(eps + softplus(u)) — exact, elementwise."""
    loc, u, bias = kl.get_weights()
    sigma = np.finfo(np.float32).eps + np.logaddexp(0.0, u)
    asm.put(base + ("kernel_mean",), loc)
    asm.put(base + ("kernel_log_sigma",), np.log(sigma).astype(np.float32))
    asm.put(base + ("bias",), bias)


def _put_bayes_residual_block(asm, pool, base, kind):
    """_residual_block(Bayes=True) (DLlib/module.py:202-220) →
    blocks.ResidualBlock(bayes=True): two Flipout convs + norms."""
    norm_cls = _NORM_CLASSES.get(kind)
    _put_flipout(asm, base + ("FlipoutConv_0",),
                 pool.take("Convolution2DFlipout"))
    if norm_cls:
        _put_norm(asm, base + ("Norm_0",), pool.take(norm_cls), kind)
    _put_flipout(asm, base + ("FlipoutConv_1",),
                 pool.take("Convolution2DFlipout"))
    if norm_cls:
        _put_norm(asm, base + ("Norm_1",), pool.take(norm_cls), kind)


def _put_convlstm(asm, base, kl):
    """Keras ConvLSTM2D [kernel (kh,kw,in,4f), recurrent (kh,kw,f,4f),
    bias (4f)] → models.convlstm.ConvLSTM (same packed i,f,g,o order)."""
    kernel, recurrent, bias = kl.get_weights()
    asm.put(base + ("input_conv", "kernel"), kernel)
    asm.put(base + ("input_conv", "bias"), bias)
    asm.put(base + ("recurrent_conv", "kernel"), recurrent)


def _put_te_encoder(asm, base, rnn_layer, dense_layer):
    """Keras RNN(LSTMCell(u)) + Dense → blocks.TEEncoder. Keras packs
    gates [i, f, c, o]; Flax OptimizedLSTMCell names them i/f/g/o with
    per-gate Dense (input path bias-free, hidden path biased)."""
    kernel, recurrent, bias = rnn_layer.get_weights()
    u = recurrent.shape[0]
    cell = base + ("OptimizedLSTMCell_0",)
    for gi, g in enumerate(("i", "f", "g", "o")):
        sl = slice(gi * u, (gi + 1) * u)
        asm.put(cell + ("i" + g, "kernel"), kernel[:, sl])
        asm.put(cell + ("h" + g, "kernel"), recurrent[:, sl])
        asm.put(cell + ("h" + g, "bias"), bias[sl])
    asm.put(base + ("Dense_0", "kernel"), dense_layer.kernel)
    asm.put(base + ("Dense_0", "bias"), dense_layer.bias)


def _put_attention(asm, base, kl):
    """DLlib/attention.py SelfAttention → models.attention.SelfAttention
    (γ + f/g/h 1×1 bias-free convs, same names)."""
    asm.put(base + ("f", "kernel"), kl.kernel_f)
    asm.put(base + ("g", "kernel"), kl.kernel_g)
    asm.put(base + ("h", "kernel"), kl.kernel_h)
    asm.put(base + ("gamma",), np.asarray(kl.gamma).reshape(1))


def _put_upsample(asm, pool, base, method="conv_transpose"):
    """_upsample (DLlib/module.py:152-159) → blocks.Upsample."""
    if method == "conv_transpose":
        _put_conv_t(asm, base + ("ConvTranspose_0",),
                    pool.take("Conv2DTranspose"))
    else:  # Interpol_Conv: UpSampling2D (weightless) + Conv2D
        pool.rest("UpSampling2D")
        _put_conv(asm, base + ("Conv_0",), pool.take("Conv2D"))


def _template(flax_module, *example_args, **kwargs):
    import jax
    return flax_module.init(jax.random.PRNGKey(0), *example_args, **kwargs)


# --------------------------------------------------------------------------
# architecture converters
# --------------------------------------------------------------------------

def convert_unet(keras_model, flax_unet, *example_args):
    """Reference UNet (DLlib/module.py:345-462) → models.unet.UNet.
    Handles ME-ConvLSTM front, TE LSTM→AdaIN conditioning, first-level
    decoder self-attention, and the std/bayesian σ head."""
    m = flax_unet
    tpl = _template(m, *example_args, train=False)
    asm, pool = _Assembler(tpl), _LayerPool(keras_model)
    kind = m.norm
    P = ("params",)

    if m.me_layer:
        _put_convlstm(asm, P + ("ConvLSTM_0",), pool.take("ConvLSTM2D"))
    for level in range(m.num_layers):
        _put_conv_block(asm, pool, P + (f"ConvBlock_{level}",), kind)
        if m.te_input:
            _put_te_encoder(asm, P + (f"TEEncoder_{level}",),
                            pool.take("RNN"), pool.take("Dense"))
    _put_conv_block(asm, pool, P + (f"ConvBlock_{m.num_layers}",), kind)
    for cont in range(m.num_layers):
        _put_upsample(asm, pool, P + (f"Upsample_{cont}",))
        if m.self_attention and cont == 0:
            _put_attention(asm, P + ("SelfAttention_0",),
                           pool.take("SelfAttention"))
        _put_conv_block(
            asm, pool, P + (f"ConvBlock_{m.num_layers + 1 + cont}",), kind)
    _put_conv(asm, P + ("Conv_0",), pool.take("Conv2D"))
    if m.bayesian or m.std_out:
        _put_conv(asm, P + ("Conv_1",), pool.take("Conv2D"))   # 16-f stem
        _put_conv(asm, P + ("Conv_2",), pool.take("Conv2D"))   # σ head
    pool.assert_consumed(["Conv2D", "Conv2DTranspose", "ConvLSTM2D",
                          "RNN", "Dense", "SelfAttention",
                          _NORM_CLASSES.get(kind, "InstanceNormalization")])
    return asm.finish()


def _convert_multi_decoder(keras_model, flax_module, example_args,
                           branches, te_mode):
    """Shared converter for MDWF_Generator (3 decoders) and PM_Generator
    (2 decoders). Keras creates decoder layers LEVEL-major (all branches'
    upsamples, then each branch's block per level —
    DLlib/module.py:512-558, 631-672); the Flax modules create them
    BRANCH-major — the cursor arithmetic below de-interleaves."""
    m = flax_module
    tpl = _template(m, *example_args, train=False)
    asm, pool = _Assembler(tpl), _LayerPool(keras_model)
    kind = m.norm
    nb_br = len(branches)
    P = ("params",)
    enc = P + ("_SharedEncoder_0",)

    if getattr(m, "me_layer", False):
        _put_convlstm(asm, P + ("ConvLSTM_0",), pool.take("ConvLSTM2D"))
    for level in range(m.num_layers):
        _put_conv_block(asm, pool, enc + (f"ConvBlock_{level}",), kind)
        if m.te_input and te_mode == "adain":
            _put_te_encoder(asm, enc + (f"TEEncoder_{level}",),
                            pool.take("RNN"), pool.take("Dense"))
        if m.te_input and te_mode == "dense_l1" and level == 1:
            dense = pool.take("Dense")
            asm.put(enc + ("Dense_0", "kernel"), dense.kernel)
            asm.put(enc + ("Dense_0", "bias"), dense.bias)
    _put_conv_block(asm, pool, enc + (f"ConvBlock_{m.num_layers}",), kind)

    # Decoders: snapshot the remaining per-class layers and index them.
    cts = pool.rest("Conv2DTranspose")
    convs = pool.rest("Conv2D")
    norm_cls = _NORM_CLASSES.get(kind)
    norms = pool.rest(norm_cls) if norm_cls else []
    sas = pool.rest("SelfAttention")
    L = m.num_layers
    if len(cts) != nb_br * L:
        raise ValueError(f"expected {nb_br * L} decoder Conv2DTranspose, "
                         f"got {len(cts)}")
    sa_cursor = 0
    for b, (name, head_has_sa) in enumerate(branches):
        dec = P + (name,)
        for level in range(L):
            _put_conv_t(asm, dec + (f"Upsample_{level}", "ConvTranspose_0"),
                        cts[nb_br * level + b])
        # conv blocks: level-major [br0.c1, br0.c2, br1.c1, …] per level
        for level in range(L):
            base = dec + (f"ConvBlock_{level}",)
            i = 2 * nb_br * level + 2 * b
            _put_conv(asm, base + ("Conv_0",), convs[i])
            _put_conv(asm, base + ("Conv_1",), convs[i + 1])
            if norm_cls:
                _put_norm(asm, base + ("Norm_0",), norms[i], kind)
                _put_norm(asm, base + ("Norm_1",), norms[i + 1], kind)
        _put_conv(asm, dec + ("Conv_0",), convs[2 * nb_br * L + b])
    # Self-attention (cont==0 only, created in branch order for the
    # flagged branches)
    for name, has_sa in branches:
        if has_sa:
            _put_attention(asm, P + (name, "SelfAttention_0"),
                           sas[sa_cursor])
            sa_cursor += 1
    if sa_cursor != len(sas):
        raise ValueError("self-attention flag mismatch between keras model "
                         "and flax module")
    return asm.finish()


def convert_mdwf_generator(keras_model, flax_mdwf, *example_args):
    """MDWF_Generator (DLlib/module.py:465-569) → models.unet.MDWFNet.
    Branch creation order in the reference source: x2=WF, x3=R2*, x4=FM."""
    m = flax_mdwf
    branches = [("dec_wf", m.wf_self_attention),
                ("dec_r2", m.r2_self_attention),
                ("dec_fm", m.fm_self_attention)]
    return _convert_multi_decoder(keras_model, m, example_args, branches,
                                  "dense_l1")


def convert_pm_generator(keras_model, flax_vet, *example_args):
    """PM_Generator / VET-Net (DLlib/module.py:572-686) →
    models.unet.VETNet. Branch order: x2=R2*, x3=FM."""
    m = flax_vet
    branches = [("dec_r2", m.r2_self_attention),
                ("dec_fm", m.fm_self_attention)]
    return _convert_multi_decoder(keras_model, m, example_args, branches,
                                  "adain")


def convert_encoder(keras_model, flax_encoder, *example_args):
    """Reference encoder (DLlib/module.py:781-838) → models.vae.Encoder.
    The `sd_out=True` TFP head maps to the explicit (μ, σ) convs."""
    m = flax_encoder
    tpl = _template(m, *example_args, train=False)
    asm, pool = _Assembler(tpl), _LayerPool(keras_model)
    kind = m.norm
    P = ("params",)
    if m.multi_echo:
        _put_convlstm(asm, P + ("ConvLSTM_0",), pool.take("ConvLSTM2D"))
    _put_conv(asm, P + ("Conv_0",), pool.take("Conv2D"))
    rb = 0
    for level in range(m.num_layers):
        for _ in range(m.num_res_blocks):
            _put_residual_block(asm, pool, P + (f"ResidualBlock_{rb}",),
                                kind)
            rb += 1
        _put_conv(asm, P + (f"Conv_{1 + level}",), pool.take("Conv2D"))
    if m.nl_self_attention:
        _put_residual_block(asm, pool, P + (f"ResidualBlock_{rb}",), kind)
        _put_attention(asm, P + ("SelfAttention_0",),
                       pool.take("SelfAttention"))
        _put_residual_block(asm, pool, P + (f"ResidualBlock_{rb + 1}",),
                            kind)
    c = 1 + m.num_layers
    _put_conv(asm, P + (f"Conv_{c}",), pool.take("Conv2D"))
    if m.sd_out:
        _put_conv(asm, P + (f"Conv_{c + 1}",), pool.take("Conv2D"))  # μ
        _put_conv(asm, P + (f"Conv_{c + 2}",), pool.take("Conv2D"))  # σ
    else:
        _put_conv(asm, P + (f"Conv_{c + 1}",), pool.take("Conv2D"))
    pool.assert_consumed(["Conv2D", "ConvLSTM2D", "SelfAttention"])
    return asm.finish()


def convert_decoder(keras_model, flax_decoder, *example_args):
    """Reference decoder (DLlib/module.py:841-891) → models.vae.Decoder
    (Interpol_Conv upsampling). With `bayes_layer=True` the re/im-split
    Flipout head (:880-885) maps via `_put_flipout` — the deterministic
    mean-kernel forward then matches; Flipout sampling/KL run only on the
    Flax side."""
    m = flax_decoder
    tpl = _template(m, *example_args, train=False)
    asm, pool = _Assembler(tpl), _LayerPool(keras_model)
    kind = m.norm
    P = ("params",)
    _put_conv(asm, P + ("Conv_0",), pool.take("Conv2D"))
    _put_conv(asm, P + ("Conv_1",), pool.take("Conv2D"))
    rb = 0
    if m.nl_self_attention:
        _put_residual_block(asm, pool, P + (f"ResidualBlock_{rb}",), kind)
        _put_attention(asm, P + ("SelfAttention_0",),
                       pool.take("SelfAttention"))
        _put_residual_block(asm, pool, P + (f"ResidualBlock_{rb + 1}",),
                            kind)
        rb += 2
    for level in range(m.num_layers):
        _put_upsample(asm, pool, P + (f"Upsample_{level}",),
                      method="interpol_conv")
        for _ in range(m.num_res_blocks):
            _put_residual_block(asm, pool, P + (f"ResidualBlock_{rb}",),
                                kind)
            rb += 1
    norm_cls = _NORM_CLASSES.get(kind)
    if norm_cls:
        _put_norm(asm, P + ("Norm_0",), pool.take(norm_cls), kind)
    _put_conv(asm, P + ("Conv_2",), pool.take("Conv2D"))
    if m.bayes_layer:
        _put_flipout(asm, P + ("FlipoutConv_0",),
                     pool.take("Convolution2DFlipout"))
        _put_flipout(asm, P + ("FlipoutConv_1",),
                     pool.take("Convolution2DFlipout"))
    pool.assert_consumed(["Conv2D", "SelfAttention",
                          "Convolution2DFlipout"])
    return asm.finish()


def convert_bayes_decoder(keras_model, flax_decoder, *example_args):
    """Reference Bayes_decoder (DLlib/module.py:894-938) →
    models.vae.BayesDecoder: stem Flipout, then two towers (real/imag),
    each [Flipout, (res+SA+res), num_layers × (Interpol_Conv upsample,
    res-blocks), Norm, Flipout head] with all residual-block convs
    Flipout (`Bayes=True`). Keras creation order is stem, then tower 0
    fully, then tower 1 (the reference builds each `__x` to completion
    in its loop), matching the Flax module's auto-naming order."""
    import jax
    m = flax_decoder
    # the Bayes residual blocks sample Flipout perturbations even at
    # eval (reference tfp semantics), so init needs the 'bayes' stream
    key = jax.random.PRNGKey(0)
    tpl = m.init({"params": key, "bayes": key}, *example_args, train=False)
    asm, pool = _Assembler(tpl), _LayerPool(keras_model)
    kind = m.norm
    norm_cls = _NORM_CLASSES.get(kind)
    P = ("params",)
    _put_flipout(asm, P + ("FlipoutConv_0",),
                 pool.take("Convolution2DFlipout"))
    fc = 1   # FlipoutConv cursor (module-level heads)
    rb = 0   # ResidualBlock cursor
    up = 0   # Upsample cursor
    sa = 0   # SelfAttention cursor
    norm0 = 0  # tower-tail Norm cursor
    for _tower in range(2):
        _put_flipout(asm, P + (f"FlipoutConv_{fc}",),
                     pool.take("Convolution2DFlipout"))
        fc += 1
        if m.nl_self_attention:
            _put_bayes_residual_block(asm, pool,
                                      P + (f"ResidualBlock_{rb}",), kind)
            _put_attention(asm, P + (f"SelfAttention_{sa}",),
                           pool.take("SelfAttention"))
            _put_bayes_residual_block(asm, pool,
                                      P + (f"ResidualBlock_{rb + 1}",),
                                      kind)
            rb += 2
            sa += 1
        for _level in range(m.num_layers):
            _put_upsample(asm, pool, P + (f"Upsample_{up}",),
                          method="interpol_conv")
            up += 1
            for _ in range(m.num_res_blocks):
                _put_bayes_residual_block(asm, pool,
                                          P + (f"ResidualBlock_{rb}",),
                                          kind)
                rb += 1
        if norm_cls:
            _put_norm(asm, P + (f"Norm_{norm0}",), pool.take(norm_cls),
                      kind)
        norm0 += 1
        _put_flipout(asm, P + (f"FlipoutConv_{fc}",),
                     pool.take("Convolution2DFlipout"))
        fc += 1
    pool.assert_consumed(["Conv2D", "SelfAttention",
                          "Convolution2DFlipout"])
    return asm.finish()


def convert_patchgan(keras_model, flax_patchgan, *example_args):
    """Reference PatchGAN (DLlib/module.py:266-317) →
    models.discriminator.PatchGAN.

    Semantics note: Keras 3 normalizes the kernel IN PLACE during
    training steps and applies the stored kernel raw at inference; flax
    `nn.SpectralNorm` (standard SN-GAN semantics) re-normalizes on every
    forward. For trained checkpoints the stored Keras kernel already has
    σ≈1, so both frameworks compute the same function and conversion is
    faithful. For a never-trained Keras model with un-normalized kernels
    the flax side will (correctly) normalize where Keras would not — the
    bridge tests drive the Keras model to its power-iteration fixed point
    first, mirroring a trained checkpoint. The converter seeds the flax
    u/σ state with the CONVERGED power iteration of each kernel so the
    first flax forward already uses the exact σ."""
    m = flax_patchgan
    tpl = _template(m, *example_args, train=False)
    asm, pool = _Assembler(tpl), _LayerPool(keras_model)
    kind = m.norm
    P = ("params",)
    n_sn = m.n_downsamplings + 2
    for i in range(n_sn):
        sn = pool.take("SpectralNormalization")
        conv = sn.layer
        base = P + (f"Conv_{i}",)  # flax SpectralNorm is params-transparent
        kernel = np.asarray(conv.kernel)
        asm.put(base + ("kernel",), kernel)
        if conv.use_bias:
            asm.put(base + ("bias",), conv.bias)
        # Power-iteration state, converged so the flax-side σ estimate is
        # exact from the first call. flax SpectralNorm names its state
        # with slash-joined single keys.
        w2d = kernel.reshape(-1, kernel.shape[-1]).astype(np.float64)
        u = np.asarray(sn.vector_u, np.float64).reshape(1, -1)
        for _ in range(100):
            v = u @ w2d.T
            v /= np.linalg.norm(v) + 1e-12
            u = v @ w2d
            u /= np.linalg.norm(u) + 1e-12
        sigma = float((v @ w2d @ u.T)[0, 0])
        st = ("batch_stats", f"SpectralNorm_{i}", f"Conv_{i}/kernel/sigma")
        u_st = ("batch_stats", f"SpectralNorm_{i}", f"Conv_{i}/kernel/u")
        asm.put(st, np.full(asm.flat[st].shape, sigma, np.float32))
        asm.put(u_st, u.astype(np.float32).reshape(asm.flat[u_st].shape))
        if i in range(1, n_sn - 1) and kind != "none":
            _put_norm(asm, P + (f"Norm_{i - 1}",),
                      pool.take(_NORM_CLASSES[kind]), kind)
    if m.self_attention:
        _put_attention(asm, P + ("SelfAttention_0",),
                       pool.take("SelfAttention"))
    pool.assert_consumed(["SpectralNormalization", "SelfAttention",
                          _NORM_CLASSES.get(kind, "InstanceNormalization")])
    return asm.finish()

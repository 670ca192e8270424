"""Keras↔Flax model-weight bridge.

Lets users of the TF reference (jpmeneses/IDEAL-GAN) bring their trained
Keras checkpoints into this framework: build (or restore) the reference
Keras model, then convert its weights into a Flax param pytree for the
equivalent `ideal_gan_tpu.models` module.

    from ideal_gan_tpu.bridge import convert_unet
    params = convert_unet(keras_model, flax_unet, example_input)

TF is imported lazily — the bridge is optional at runtime.
"""

from .keras_bridge import (convert_bayes_decoder,
                           convert_decoder, convert_encoder,
                           convert_mdwf_generator, convert_patchgan,
                           convert_pm_generator, convert_unet,
                           load_params_npz, save_params_npz)
from .refload import install_tf_shims, load_reference_dlmodule

__all__ = [
    "convert_unet", "convert_mdwf_generator", "convert_pm_generator",
    "convert_encoder", "convert_decoder", "convert_bayes_decoder",
    "convert_patchgan",
    "save_params_npz", "load_params_npz",
    "install_tf_shims", "load_reference_dlmodule",
]

"""Flax model zoo."""

from .attention import SelfAttention, adain
from .bayes import FlipoutConv
from .blocks import ConvBlock, Norm, ResidualBlock, TEEncoder, Upsample
from .complexnn import (
    ComplexBatchNorm,
    ComplexConv,
    ComplexConvTranspose,
    PMComplex,
    cardioid,
    complex_max_pool_2x2,
    crelu,
    modrelu,
    zrelu,
)
from .convlstm import ConvLSTM
from .discriminator import CriticZ, PatchGAN, SGAN
from .fourier import fourier_layer
from .ldm import DenoiseUNet
from .unet import MDWFNet, UNet, VETNet
from .vae import BayesDecoder, Decoder, Encoder
from .vq import VectorQuantizer

__all__ = [
    "UNet", "MDWFNet", "VETNet", "Encoder", "Decoder", "BayesDecoder",
    "PatchGAN", "CriticZ", "SGAN", "VectorQuantizer", "DenoiseUNet",
    "PMComplex", "ComplexConv", "ComplexConvTranspose", "ComplexBatchNorm",
    "ConvLSTM", "SelfAttention", "adain", "FlipoutConv",
    "ConvBlock", "ResidualBlock", "Upsample", "Norm", "TEEncoder",
    "crelu", "zrelu", "modrelu", "cardioid", "complex_max_pool_2x2",
    "fourier_layer",
]

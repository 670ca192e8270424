"""Evaluation: generative metrics, ROI bias pipelines, exporters."""

from .inception import (
    InceptionV3Features,
    echoes_to_inception_input,
    init_inception_v3,
    load_inception_npz,
)
from .samples import save_sample_grid
from .metrics import (
    FIDAccumulator,
    VGG19Features,
    covariance_map,
    echoes_to_vgg_input,
    frechet_distance,
    init_vgg19,
    load_vgg19_npz,
    mmd_linear,
    ms_ssim,
    perceptual_cosine_loss,
    ssim,
)

__all__ = [
    "VGG19Features", "init_vgg19", "load_vgg19_npz", "echoes_to_vgg_input",
    "perceptual_cosine_loss", "frechet_distance", "FIDAccumulator",
    "mmd_linear", "covariance_map", "ssim", "ms_ssim",
    "save_sample_grid", "InceptionV3Features", "init_inception_v3",
    "load_inception_npz", "echoes_to_inception_input",
]

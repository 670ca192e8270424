"""ideal_gan_tpu — TPU-native (JAX/Flax/Pallas) water–fat separation framework.

A ground-up rebuild of the capabilities of jpmeneses/IDEAL-GAN: deep-learning
MRI water–fat separation and liver fat quantification (PDFF, R2*, B0
field-map) from gradient-echo multi-echo CSE-MRI acquisitions.

Subpackages
-----------
physics   : differentiable multi-peak IDEAL signal model (forward synthesis,
            cycle operator, least-squares map fitting, uncertainty
            propagation) — pure jnp + fused Pallas kernels.
ops       : Pallas TPU kernels and low-level array ops.
models    : Flax model zoo (U-Net, MDWF-Net, VET-Net, PI-VAE encoder/decoders,
            PatchGAN, complex-valued nets, LDM denoising U-Net).
prob      : probability distributions (Rician) as plain-jnp classes.
losses    : GAN losses, heteroscedastic/Rician NLL, TV/L1 regularizers.
data      : HDF5/DICOM/NIfTI loaders, MEBCRN layout converters, augmentation.
diffusion : DDPM/DDIM schedules and lax.scan samplers.
train     : trainers mirroring the reference train-*.py entry points.
eval      : ROI bias pipelines, generative metrics, exporters.
parallel  : device mesh / sharding helpers (pjit DP over batch axis).
utils     : config (YAML overlay semantics), orbax checkpointing, summaries.
"""

__version__ = "0.1.0"

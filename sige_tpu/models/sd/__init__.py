"""Stable Diffusion model family (latent diffusion: UNet + VAE)."""

from .unet import SDUNetConfig, SIGESDUNet
from .vae import SDVAEConfig, SIGEDecoder, SIGEEncoder

__all__ = [
    "SDUNetConfig",
    "SIGESDUNet",
    "SDVAEConfig",
    "SIGEEncoder",
    "SIGEDecoder",
]

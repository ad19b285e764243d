"""DDPM model family (LSUN-church SDEdit)."""

from .unet import DDPMUNetConfig, SIGEFusedUNet

__all__ = ["DDPMUNetConfig", "SIGEFusedUNet"]

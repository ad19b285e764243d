"""DDPM model family (LSUN-church SDEdit)."""

from .unet import DDPMUNetConfig, SIGEFusedUNet
from .vanilla import VanillaDDPMUNet

__all__ = ["DDPMUNetConfig", "SIGEFusedUNet", "VanillaDDPMUNet"]

"""Progressive Distillation model family (LSUN-church SDEdit, few-step)."""

from .unet import PDUNetConfig, SIGEPDUNet

__all__ = ["PDUNetConfig", "SIGEPDUNet"]

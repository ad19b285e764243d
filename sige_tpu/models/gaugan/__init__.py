"""GauGAN (SPADE) model family — Cityscapes semantic-map editing."""

from .spade import SPADEGenConfig, SIGEFusedSPADEGenerator
from .sub_mobile import SIGESubMobileSPADEGenerator, decode_config

__all__ = [
    "SPADEGenConfig",
    "SIGEFusedSPADEGenerator",
    "SIGESubMobileSPADEGenerator",
    "decode_config",
]

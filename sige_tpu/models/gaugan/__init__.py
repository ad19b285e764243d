"""GauGAN (SPADE) model family — Cityscapes semantic-map editing."""

from .spade import SPADEGenConfig, SIGEFusedSPADEGenerator
from .sub_mobile import SIGESubMobileSPADEGenerator, decode_config
from .vanilla import VanillaSPADEGenerator

__all__ = [
    "SPADEGenConfig",
    "SIGEFusedSPADEGenerator",
    "SIGESubMobileSPADEGenerator",
    "VanillaSPADEGenerator",
    "decode_config",
]

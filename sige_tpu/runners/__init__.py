"""Per-suite runners (preprocess / generate / profile harnesses)."""

from .diffusion_runner import DiffusionRunConfig, DiffusionRunner
from .gaugan_runner import GauGANRunConfig, GauGANRunner
from .pd_runner import PDRunConfig, PDRunner
from .sd_runner import SDRunConfig, SDRunner

__all__ = [
    "DiffusionRunner", "DiffusionRunConfig",
    "PDRunner", "PDRunConfig",
    "GauGANRunner", "GauGANRunConfig",
    "SDRunner", "SDRunConfig",
]

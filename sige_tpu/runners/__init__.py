"""Per-suite runners (preprocess / generate / profile harnesses)."""

from .diffusion_runner import DiffusionRunner, DiffusionRunConfig

__all__ = ["DiffusionRunner", "DiffusionRunConfig"]

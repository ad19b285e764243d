"""Datasets and image IO for the benchmark suites."""

from .datasets import CityscapesEditDataset, SDEditDataset
from .image import load_image, save_image

__all__ = ["SDEditDataset", "CityscapesEditDataset", "load_image", "save_image"]
